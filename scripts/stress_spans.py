"""Span-dedup stress probe: the boilerplate-hot corpus that kills the
raw/uncapped plan (SCALE.md "Stress probe"; VERDICT r10 #1).

Builds >=100k synthetic docs where ONE 8-token window (a license-style
boilerplate line) is planted in 50% of them — the adversarial shape for
gram-keyed span discovery: uncapped, that window's posting list alone
creates ~(N/2)^2/2 candidate pairs (1.25e9 at N=100k, a guaranteed
skewed-shuffle blowup). The PRODUCTION defaults (hash_grams=True,
max_gram_docs=256) must:

1. complete the full duplicate_spans pass in bounded wall-clock;
2. keep every PLANTED cross-doc span (a 12-token passage shared by two
   known docs, rare windows) position-exact — the cap bounds pair
   discovery, never span geometry.

Usage: python scripts/stress_spans.py [n_docs=100000] [time_budget_s=300]
Exits nonzero if the planted spans are missing/wrong or the budget blows.
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dca_manager_spark.operators.dedup import duplicate_spans  # noqa: E402
from dca_manager_spark.session import get_bench_session  # noqa: E402

BOILER = "this document is provided as is without warranty whatsoever"
PASSAGE = "p1 p2 p3 p4 p5 p6 p7 p8 p9 p10 p11 p12"  # 12 rare tokens


def main() -> int:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    budget = float(sys.argv[2]) if len(sys.argv) > 2 else 300.0
    spark = get_bench_session("span-stress")
    spark.sparkContext.setLogLevel("ERROR")

    # Even ids carry the boilerplate line (50% hot window); every doc
    # gets a unique filler tail so no OTHER window repeats. Two pinned
    # docs share the rare 12-token passage at known offsets.
    base = spark.range(n_docs).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.when(F.col("id") % 2 == 0, F.lit(BOILER + " ")).otherwise(F.lit("")),
            F.concat_ws(
                " ",
                F.transform(
                    F.sequence(F.lit(0), F.lit(11)),
                    lambda i: F.concat(F.lit("u"), F.col("id"), F.lit("x"), i),
                ),
            ),
        ).alias("text"),
    )
    planted = spark.createDataFrame(
        [
            (n_docs + 1, "lead1 lead2 " + PASSAGE + " tail1"),
            (n_docs + 2, PASSAGE + " other1 other2"),
        ],
        "doc_id long, text string",
    )
    corpus = base.unionByName(planted).repartition(64).localCheckpoint()
    n = corpus.count()
    hot = corpus.filter(F.col("text").contains(BOILER)).count()
    print(f"corpus: {n} docs, hot window in {hot} ({hot / n:.0%})")

    t0 = time.perf_counter()
    spans = duplicate_spans(corpus, "doc_id", "text", k=8)  # BARE production call
    got = {tuple(r) for r in spans.collect()}
    elapsed = time.perf_counter() - t0
    print(f"duplicate_spans (bare/production): {len(got)} spans in {elapsed:.1f}s")

    want = (n_docs + 1, n_docs + 2, 2, 0, 12)
    ok = True
    if want not in got:
        print(f"FAIL: planted span {want} missing; sample={sorted(got)[:5]}")
        ok = False
    # Hot-window pairs must NOT appear: the 9-token even-doc prefix
    # windows (boiler + unique first token) are unique per doc, so the
    # only cross-doc window is the boilerplate gram itself — capped out.
    hot_pairs = [s for s in got if s[0] < n_docs and s[1] < n_docs]
    if hot_pairs:
        print(f"FAIL: {len(hot_pairs)} boilerplate-only pairs leaked the cap")
        ok = False
    if elapsed > budget:
        print(f"FAIL: {elapsed:.1f}s exceeds budget {budget:.0f}s")
        ok = False
    print("PASS" if ok else "FAIL")
    spark.stop()
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
