"""Decontamination stress probe beyond the test SFs (SCALE.md).

Builds a ~100k-doc corpus (replicas of sf0.1 documents with per-replica
word edits, same recipe as stress_dedup) and a small benchmark set
(every 500th base doc, verbatim), then times
``ngram_decontaminate`` — the broadcast n-gram membership scrub — and
verifies every planted verbatim benchmark doc's replicas are caught.

The property that matters at 100 TB: cost is ONE map-side pass over the
corpus grams (broadcast hash join, no corpus shuffle) + a hit-only
aggregation. Runtime should track corpus token count, never
corpus x benchmark.

Usage: python scripts/stress_decontam.py [replicas=20]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dca_manager_spark.io.readers import load_table  # noqa: E402
from dca_manager_spark.operators.dedup import ngram_decontaminate  # noqa: E402
from dca_manager_spark.session import get_bench_session  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_bench_session("decontam-stress")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    n_base = base.count()
    corpus = (
        base.crossJoin(spark.range(replicas).select(F.col("id").alias("__rep")))
        .select(
            (F.col("doc_id") * replicas + F.col("__rep")).alias("doc_id"),
            # replica 0 keeps the text verbatim; others append a marker
            # word (still sharing every original n-gram window)
            F.when(F.col("__rep") == 0, F.col("text"))
            .otherwise(F.concat_ws(" ", F.col("text"), F.lit("rep"), F.col("__rep")))
            .alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    n_corpus = corpus.count()

    benchmark = base.filter(F.col("doc_id") % 500 == 0).localCheckpoint(eager=True)
    n_bench = benchmark.count()
    print(f"corpus: {n_corpus} docs ({replicas}x{n_base}); benchmark: {n_bench}")

    t0 = time.time()
    flagged = ngram_decontaminate(
        corpus, benchmark, "doc_id", "text", n=8, flags=True
    )
    n_contaminated = flagged.filter(F.col("contaminated")).count()
    t1 = time.time()
    print(f"flag pass: {t1 - t0:.1f}s; contaminated: {n_contaminated}/{n_corpus}")

    # every replica of a benchmark doc shares all its 8-gram windows ->
    # all replicas x planted docs must be flagged
    planted = flagged.filter(
        (F.floor(F.col("doc_id") / replicas) % 500 == 0) & ~F.col("contaminated")
    ).count()
    print(f"planted misses: {planted} (expect 0)")

    t2 = time.time()
    kept = ngram_decontaminate(corpus, benchmark, "doc_id", "text", n=8)
    n_kept = kept.count()
    t3 = time.time()
    print(f"drop pass: {t3 - t2:.1f}s; kept {n_kept}/{n_corpus}")
    assert planted == 0, "planted benchmark replicas escaped the scrub"
    assert n_kept == n_corpus - n_contaminated


if __name__ == "__main__":
    main()
