"""Dedup stress probe beyond the test SFs (SCALE.md "Stress probe").

Builds a ~100k-doc corpus (REPLICAS x sf0.1 documents; each replica is a
true near-dup of its base — word dropped / word appended / case change),
then times the production-path (xxhash64) MinHash-LSH pair discovery and
the full cluster-canonical pipeline on local[32].

Usage: python scripts/stress_dedup.py [replicas=20]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dca_manager_spark.io.readers import load_table  # noqa: E402
from dca_manager_spark.operators.dedup import (  # noqa: E402
    dedup_keep_canonical,
    minhash_lsh_pairs,
)
from dca_manager_spark.session import get_bench_session  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_bench_session("dedup-stress")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    n_base = base.count()
    variants = base.crossJoin(
        spark.range(replicas).select(F.col("id").alias("__rep"))
    ).select(
        (F.col("doc_id") * replicas + F.col("__rep")).alias("doc_id"),
        F.when(F.col("__rep") % 3 == 0, F.col("text"))
        .when(
            F.col("__rep") % 3 == 1,
            # drop the first word
            F.expr("substring(text, instr(text, ' ') + 1)"),
        )
        .otherwise(F.concat(F.col("text"), F.lit(" replicated-tail-token")))
        .alias("text"),
    )
    corpus = variants.localCheckpoint()
    n = corpus.count()
    print(f"corpus: {n} docs ({n_base} bases x {replicas} replicas)")

    t0 = time.perf_counter()
    pairs = minhash_lsh_pairs(
        corpus, "doc_id", "text", num_hashes=64, bands=16, threshold=0.7,
        mode="word",
    ).localCheckpoint()
    n_pairs = pairs.count()
    t_pairs = time.perf_counter() - t0
    print(f"minhash_lsh (xxhash64): {n_pairs} verified pairs in {t_pairs:.1f}s")

    t0 = time.perf_counter()
    survivors = dedup_keep_canonical(corpus, pairs, "doc_id")
    n_surv = survivors.count()
    t_cc = time.perf_counter() - t0
    print(f"cluster+canonical: {n_surv} survivors in {t_cc:.1f}s "
          f"(reduction {n / max(n_surv, 1):.1f}x)")
    spark.stop()


if __name__ == "__main__":
    main()
