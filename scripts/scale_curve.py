"""Scale-curve probe (VERDICT r13 #3): turn the "would survive 100x"
design claims of the heavy dedup/ANN operators into MEASURED curves.

For each operator, run the same synthetic workload at 1x / 3x / 10x
and fit the scaling exponent b of t = a * n^b by least squares on
(log n, log t). The design claims under test:

- duplicate_spans (production defaults: hashed grams + 256-doc
  posting cap): gram-keyed equi join with df-capped posting lists —
  near-linear in corpus size even when 50% of docs share one hot
  window (the quadratic-shape adversary).
- minhash_incremental_filter vs a PINNED corpus index: cost tracks
  the BATCH, the corpus is never re-shingled — near-linear in batch
  size at fixed corpus.
- ivf_pq_rerank_topk: route -> ADC shortlist -> exact re-rank; per-
  query work is the probed cells' members, so serve time is linear
  in corpus at fixed queries/cells/probes.
- connected_components: alternating large/small-star, O(log n)
  rounds x O(E) per round — ~n log n on a path+cliques mixture.

Reading the fit: the per-job floor (~0.2-0.4s/job on this box) and
fixed plan analysis DEFLATE the exponent at the small end, while
lineage/GC growth inflates the large end — treat b <= ~1.2 as
"linear enough", and anything approaching 2 as an offender. A warm-up
pass at the smallest size runs untimed first; each point is
best-of-2.

Usage: python scripts/scale_curve.py [base_spans=10000]
Prints one JSON line per operator {op, sizes, secs, exponent} and a
final summary; exits nonzero if any exponent exceeds MAX_EXP.
"""

from __future__ import annotations

import json
import math
import sys
import time

sys.path.insert(0, ".")

import numpy as np  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from dca_manager_spark.operators.dedup import (  # noqa: E402
    build_corpus_index,
    connected_components,
    duplicate_spans,
    minhash_incremental_filter,
)
from dca_manager_spark.operators.similarity import (  # noqa: E402
    ivf_pq_rerank_topk,
    train_pq_codebooks,
)
from dca_manager_spark.session import get_bench_session  # noqa: E402

MAX_EXP = 1.35  # n log n on a 10x span reads ~1.1-1.2; 1.35 is the alarm
SCALES = (1, 3, 10)

BOILER = "this document is provided as is without warranty whatsoever"


def fit_exponent(ns: list[int], ts: list[float]) -> float:
    xs = [math.log(n) for n in ns]
    ys = [math.log(t) for t in ts]
    mx, my = sum(xs) / len(xs), sum(ys) / len(ys)
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sum(
        (x - mx) ** 2 for x in xs
    )


def _docs(spark, n: int):
    """stress_spans-shaped corpus: 50% share ONE boilerplate window,
    unique filler tails otherwise (the posting-cap adversary)."""
    return spark.range(n).select(
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


def run_curve(name, sizes, build, evaluate) -> dict:
    """build(n) -> workload handle; evaluate(handle) forces full
    evaluation. Warm-up at sizes[0], then best-of-2 per size."""
    evaluate(build(sizes[0]))  # warm: codegen + JIT
    secs = []
    for n in sizes:
        best = float("inf")
        for _ in range(2):
            h = build(n)
            t0 = time.perf_counter()
            evaluate(h)
            best = min(best, time.perf_counter() - t0)
        secs.append(round(best, 2))
    b = round(fit_exponent(list(sizes), secs), 3)
    row = {"op": name, "sizes": list(sizes), "secs": secs, "exponent": b}
    print(json.dumps(row))
    return row


def main() -> int:
    base = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000
    spark = get_bench_session("scale-curve")
    spark.sparkContext.setLogLevel("ERROR")
    rows = []

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # 1. duplicate_spans, production defaults
    rows.append(run_curve(
        "duplicate_spans",
        [base * s for s in SCALES],
        lambda n: _docs(spark, n).localCheckpoint(),
        lambda docs: noop(duplicate_spans(docs, "doc_id", "text", k=8)),
    ))

    # 2. minhash_incremental_filter: batch scales, corpus index PINNED
    corpus_n = 3 * base
    corpus = _docs(spark, corpus_n).withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    ).localCheckpoint()
    idx = build_corpus_index(corpus, "doc_id", "text",
                             num_hashes=64, bands=16, k=3)
    idx.grams = idx.grams.localCheckpoint(eager=True)
    idx.bands = idx.bands.localCheckpoint(eager=True)
    idx.sizes = idx.sizes.localCheckpoint(eager=True)
    rows.append(run_curve(
        "minhash_incremental_batch_vs_pinned_index",
        [(3 * base * s) // 10 for s in SCALES],  # 0.3x..3x of corpus
        lambda n: _docs(spark, n).localCheckpoint(),
        lambda batch: noop(
            minhash_incremental_filter(
                batch, None, "doc_id", "text", num_hashes=64, bands=16,
                k=3, threshold=0.7, mode="word", corpus_index=idx,
            )
        ),
    ))

    # 3. ivf_pq_rerank_topk: corpus scales, 16 queries fixed
    dim, n_cells, n_queries = 32, 16, 16
    rng = np.random.default_rng(29)
    centers = rng.normal(size=(n_cells, dim)) * 4.0
    center_lit = F.array(*[
        F.array(*[F.lit(float(x)) for x in c]) for c in centers
    ])
    seeds = spark.createDataFrame(
        [(i, [float(x) for x in centers[i]]) for i in range(n_cells)],
        "cell int, centroid array<double>",
    )

    def vectors(n):
        noise = lambda j: (
            (F.xxhash64(F.col("id"), F.lit(j)) % 1000).cast("double") / 1000.0
            - 0.5
        ) * 0.8
        return (
            spark.range(n)
            .select(
                F.col("id").alias("nid"),
                F.array(*[
                    (
                        F.element_at(
                            F.element_at(
                                center_lit,
                                (F.col("id") % n_cells + 1).cast("int"),
                            ),
                            j + 1,
                        )
                        + noise(j)
                    ).cast("double")
                    for j in range(dim)
                ]).alias("embedding"),
            )
            .localCheckpoint()
        )

    books = train_pq_codebooks(
        vectors(10 * base), "embedding", m=8, k=16, sample_id_col="nid",
        residual_seeds=seeds,
    )

    def serve(corpus):
        q = corpus.filter(F.col("nid") < n_queries).select(
            F.col("nid").alias("qid"), "embedding"
        )
        noop(ivf_pq_rerank_topk(
            q, corpus, "qid", "nid", books, k=10, n_cells=n_cells,
            n_probe=4, shortlist=64, seeds=seeds,
        ))

    rows.append(run_curve(
        "ivf_pq_rerank_serve",
        [10 * base * s for s in SCALES],
        vectors,
        serve,
    ))

    # 4. connected_components: one long path + 1k-cliques mixture
    def graph(n):
        path = spark.range(n - 1).select(
            F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
        )
        # plus cliques of 32 over a disjoint id range: hub-shaped edges
        cl = spark.range(n).select(
            (F.lit(2_000_000_000) + F.col("id")).alias("id_a"),
            (F.lit(2_000_000_000) + (F.col("id") / 32).cast("long") * 32
             ).alias("id_b"),
        ).filter(F.col("id_a") != F.col("id_b"))
        pairs = path.unionByName(cl).localCheckpoint()
        ids = (
            spark.range(n).select(F.col("id"))
            .unionByName(
                spark.range(n).select((F.lit(2_000_000_000) + F.col("id")).alias("id"))
            )
            .localCheckpoint()
        )
        return pairs, ids

    rows.append(run_curve(
        "connected_components",
        [base * s for s in SCALES],
        graph,
        lambda g: noop(connected_components(g[0], g[1], max_iter=40)),
    ))

    worst = max(rows, key=lambda r: r["exponent"])
    summary = {
        "metric": "scale_exponents",
        "max_exponent": worst["exponent"],
        "worst_op": worst["op"],
        "threshold": MAX_EXP,
        "ops": {r["op"]: r["exponent"] for r in rows},
    }
    print(json.dumps(summary))
    ok = worst["exponent"] <= MAX_EXP
    print("PASS" if ok else f"FAIL: {worst['op']} exponent {worst['exponent']}")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
