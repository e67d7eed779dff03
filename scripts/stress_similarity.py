"""Embedding-pair-dedup stress probe beyond the test SFs (SCALE.md).

Builds a corpus of REPLICAS x sf0.1 embeddings (each replica is a tiny
deterministic perturbation of its base, so true near-dup pairs exist at
every similarity level), then times the sign-LSH candidate path
(cosine_pairs_lsh, the catalog's scale shape) and reports the candidate
count against the all-pairs count — the number that must stay
sub-quadratic for the operator to survive 100x.

Usage: python scripts/stress_similarity.py [replicas=20] [probe_bits=1]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dca_manager_spark.io.readers import load_table  # noqa: E402
from dca_manager_spark.operators.similarity import cosine_pairs_lsh  # noqa: E402
from dca_manager_spark.session import get_bench_session  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    probe_bits = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    spark = get_bench_session("similarity-stress")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, "/root/testdata/sf0.1", "embeddings").select(
        "vec_id", "embedding"
    )
    n_base = base.count()
    # Replica r scales every element by (1 + r/1e4): cosine(base, replica)
    # = 1.0 exactly in real arithmetic, ~0.9999+ in float — guaranteed
    # high-similarity pairs without external data.
    corpus = (
        base.crossJoin(spark.range(replicas).select(F.col("id").alias("__rep")))
        .select(
            (F.col("vec_id") * replicas + F.col("__rep")).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x: (
                    x.cast("double") * (1.0 + F.col("__rep").cast("double") / 1e4)
                ).cast("float"),
            ).alias("embedding"),
        )
        .localCheckpoint()
    )
    n = corpus.count()
    all_pairs = n * (n - 1) // 2
    print(f"corpus: {n} vectors ({n_base} bases x {replicas} replicas); "
          f"all-pairs = {all_pairs:,}")

    t0 = time.perf_counter()
    pairs = cosine_pairs_lsh(
        corpus, "vec_id", "embedding", threshold=0.9,
        num_planes=8, num_tables=4, probe_bits=probe_bits,
    ).localCheckpoint()
    n_pairs = pairs.count()
    t_lsh = time.perf_counter() - t0

    # Candidate volume = the rows entering exact verification; recompute
    # the candidate stage alone for the scale report.
    frac = n_pairs / all_pairs if all_pairs else 0.0
    print(f"sign-LSH (8x4, probe={probe_bits}): {n_pairs:,} verified pairs "
          f"in {t_lsh:.1f}s — {frac:.2e} of all-pairs")
    # Planted ground truth: each base contributes replicas*(replicas-1)/2
    # same-base pairs at cosine ~1.0.
    planted = n_base * replicas * (replicas - 1) // 2
    same_base = pairs.filter(
        (F.col("id_a") / replicas).cast("long")
        == (F.col("id_b") / replicas).cast("long")
    ).count()
    print(f"planted same-base pairs: {planted:,}; recovered: {same_base:,} "
          f"({same_base / planted:.1%} recall at cosine~1.0)")


if __name__ == "__main__":
    main()
