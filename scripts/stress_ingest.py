"""Steady-state corpus-ingest stress probe (SCALE.md "Stress probe").

Models the production loop streaming/corpus_ingest.py runs: a large kept
corpus with a PERSISTED MinHash index, then a stream of small batches —
each near-dup-gated against the index, upserted into a ManifestTable,
and appended to the index. Measures per-batch wall clock to show
steady-state cost tracks BATCH size, not corpus size (the corpus is
never re-shingled; its index frames are only scanned by the bucket
join).

Each batch is half fresh documents, half near-dups of already-kept ones
(word swapped), so the gate does real work in both directions.

Usage: python scripts/stress_ingest.py [corpus_replicas=10] [batches=5] [batch_docs=2000]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dca_manager_spark.io.manifest import ManifestTable  # noqa: E402
from dca_manager_spark.io.readers import load_table  # noqa: E402
from dca_manager_spark.operators.dedup import (  # noqa: E402
    CorpusIndex,
    build_corpus_index,
    minhash_incremental_filter,
)
from dca_manager_spark.session import get_bench_session  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batches = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    batch_docs = int(sys.argv[3]) if len(sys.argv) > 3 else 2000
    spark = get_bench_session("ingest-stress")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    work = tempfile.mkdtemp(prefix="stress_ingest_")
    base = load_table(spark, "/root/testdata/sf0.1", "documents").select(
        "doc_id", "text"
    )
    corpus = (
        base.crossJoin(spark.range(replicas).select(F.col("id").alias("__rep")))
        .select(
            (F.col("doc_id") * 1000 + F.col("__rep")).alias("doc_id"),
            F.concat(F.col("text"), F.lit(" rep "), F.col("__rep")).alias("text"),
        )
    )
    n_corpus = corpus.count()

    t0 = time.monotonic()
    idx_path = f"{work}/idx"
    build_corpus_index(corpus, "doc_id", "text").save(idx_path)
    t_index = time.monotonic() - t0

    table = ManifestTable(
        spark, f"{work}/tbl", keys=("doc_id",), precombine="doc_id",
        partition_by=(),
    )
    t0 = time.monotonic()
    table.write(corpus, "bulk_insert")
    t_load = time.monotonic() - t0
    print(
        f"corpus {n_corpus} docs: index build+save {t_index:.1f}s, "
        f"bulk load {t_load:.1f}s"
    )

    half = batch_docs // 2
    for b in range(batches):
        fresh = spark.range(half).select(
            (F.lit(10_000_000 + b * batch_docs) + F.col("id")).alias("doc_id"),
            F.concat(
                F.lit(f"batch {b} fresh doc "), F.col("id"),
                F.lit(" totally novel words "), F.md5(F.col("id").cast("string")),
            ).alias("text"),
        )
        dups = (
            corpus.orderBy("doc_id")
            .limit(half)
            .select(
                (F.col("doc_id") + F.lit(20_000_000 + b * batch_docs)).alias("doc_id"),
                F.regexp_replace(F.col("text"), r"^\w+", "swapped").alias("text"),
            )
        )
        batch = fresh.unionByName(dups).localCheckpoint(eager=True)
        t0 = time.monotonic()
        index = CorpusIndex.load(spark, idx_path)
        survivors = minhash_incremental_filter(
            batch, None, "doc_id", "text", threshold=0.5, corpus_index=index,
            **{k: index.params[k] for k in CorpusIndex.PARAM_KEYS},
        ).localCheckpoint(eager=True)
        n_surv = survivors.count()
        table.write(survivors, "upsert")
        CorpusIndex.append(spark, idx_path, survivors, "doc_id", "text")
        dt = time.monotonic() - t0
        print(
            f"batch {b}: {batch_docs} docs -> {n_surv} admitted "
            f"({batch_docs - n_surv} gated) in {dt:.1f}s"
        )


if __name__ == "__main__":
    main()
