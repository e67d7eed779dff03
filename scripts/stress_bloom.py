"""ManifestTable bloom-index stress probe (SCALE.md).

Loads REPLICAS x sf0.1 lineitem keys (~600k rows each) into a bloom_by
table committed in CHUNKS (several files), then measures point lookups:

- files admitted per lookup (the pruning factor — the quantity that
  scales: at 100 TB a key's read cost is files_admitted x file size);
- false-positive rate across a sample of present + absent keys;
- wall time per lookup with blooms vs the same read with pruning
  disabled (bloom entries stripped), at local[32] — the at-scale gap is
  larger because every admitted file is an object-store GET.

Usage: python scripts/stress_bloom.py [replicas=2] [chunks=8] [bits=1048576]

Size bits ~10x distinct keys per file (here ~50k keys/file).
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dca_manager_spark.io.manifest import ManifestTable  # noqa: E402
from dca_manager_spark.io.readers import load_table  # noqa: E402
from dca_manager_spark.session import get_bench_session  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    chunks = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    bits = int(sys.argv[3]) if len(sys.argv) > 3 else 1_048_576
    spark = get_bench_session("bloom-stress")
    spark.sparkContext.setLogLevel("ERROR")

    base = load_table(spark, "/root/testdata/sf0.1", "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    parts = []
    for r in range(replicas):
        parts.append(
            base.select(
                (F.col("l_orderkey") + F.lit(r * 10_000_000)).alias(
                    "l_orderkey"
                ),
                "l_linenumber",
                "l_extendedprice",
            )
        )
    corpus = parts[0]
    for p in parts[1:]:
        corpus = corpus.unionByName(p)
    corpus = corpus.withColumn(
        "k",
        F.concat_ws("-", F.col("l_orderkey"), F.col("l_linenumber")),
    ).localCheckpoint(eager=True)
    n = corpus.count()
    max_ok = corpus.agg(F.max("l_orderkey")).first()[0]

    with tempfile.TemporaryDirectory() as tmp:
        table = ManifestTable(
            spark,
            f"{tmp}/li",
            keys=("k",),
            precombine="l_extendedprice",
            partition_by=(),
            bloom_by=("k",),
            bloom_bits=bits,
        )
        t0 = time.perf_counter()
        for c in range(chunks):
            table.write(
                corpus.filter(F.col("l_orderkey") % chunks == c),
                "bulk_insert" if c == 0 else "insert",
            )
        t_load = time.perf_counter() - t0
        doc = table._latest_manifest()[1]
        files = doc["files"]

        present = [
            r["k"]
            for r in corpus.select("k").orderBy("k").limit(400).collect()
        ][::20]
        absent = [f"{max_ok + i}-9" for i in range(1, 40)]
        admitted_present = [
            sum(1 for f in files if table._bloom_admits(f, "k", k))
            for k in present
        ]
        admitted_absent = [
            sum(1 for f in files if table._bloom_admits(f, "k", k))
            for k in absent
        ]
        fp = sum(admitted_absent) / (len(absent) * len(files))

        t0 = time.perf_counter()
        hits = sum(
            table.read(point_filter={"k": k}).count() >= 1
            for k in present[:5]
        )
        t_bloom = (time.perf_counter() - t0) / 5
        # strip blooms -> full-file-set scan baseline
        stripped = [
            {kk: v for kk, v in f.items() if kk != "bloom"} for f in files
        ]
        doc2 = dict(doc)
        doc2["files"] = stripped
        import json as _json
        from pathlib import Path

        mid = table.commits()[-1] + 1
        (Path(table.path) / "_manifests" / f"{mid:012d}.json").write_text(
            _json.dumps(doc2)
        )
        t0 = time.perf_counter()
        hits2 = sum(
            table.read(point_filter={"k": k}).count() >= 1
            for k in present[:5]
        )
        t_plain = (time.perf_counter() - t0) / 5
        assert hits == hits2 == 5, (hits, hits2)
        print(
            f"rows={n} files={len(files)} load={t_load:.1f}s | "
            f"present keys admit avg "
            f"{sum(admitted_present)/len(admitted_present):.2f}/"
            f"{len(files)} files | absent-key fp rate {fp:.4f} | "
            f"lookup {t_bloom*1000:.0f}ms bloom vs {t_plain*1000:.0f}ms "
            f"all-files ({t_plain/max(t_bloom,1e-9):.1f}x)"
        )

    # ------------------------------------------------------------------
    # Section 2 (VERDICT r13 #6): delta-heavy MOR lookup cost vs compact
    # ------------------------------------------------------------------
    # A streaming-ingest MOR table accumulates one delta file per
    # micro-batch commit; point lookups resolve latest-per-key across
    # base + ALL admitted deltas, and key-column blooms prune deltas
    # safely (r14: non-key columns keep deltas conservatively). This
    # section measures how lookup wall-time grows with delta count and
    # how much one compact() claws back — the number that sets the
    # compaction cadence rule in SCALE.md.
    deltas = int(sys.argv[4]) if len(sys.argv) > 4 else 120
    batch = 500
    with tempfile.TemporaryDirectory() as tmp:
        mor = ManifestTable(
            spark,
            f"{tmp}/mor",
            keys=("k",),
            precombine="l_extendedprice",
            partition_by=(),
            table_type="mor",
            bloom_by=("k",),
            bloom_bits=65536,
        )
        seed = corpus.limit(200_000).localCheckpoint(eager=True)
        mor.write(seed, "bulk_insert")
        keys = [r["k"] for r in seed.select("k").orderBy("k").limit(50).collect()]
        t0 = time.perf_counter()
        for d in range(deltas):
            mor.write(
                seed.filter(
                    F.xxhash64("k", F.lit(d)) % (200_000 // batch) == 0
                ).withColumn(
                    "l_extendedprice", F.col("l_extendedprice") + d + 1
                ),
                "upsert",
            )
        t_ingest = time.perf_counter() - t0

        def avg_lookup(t, ks):
            t0 = time.perf_counter()
            for k in ks:
                t.read(point_filter={"k": k}).count()
            return (time.perf_counter() - t0) / len(ks)

        n_files_before = mor.file_count()
        t_before = avg_lookup(mor, keys[:8])
        t0 = time.perf_counter()
        replaced = mor.compact()
        t_compact = time.perf_counter() - t0
        n_files_after = mor.file_count()
        t_after = avg_lookup(mor, keys[:8])
        print(
            f"MOR deltas: base+{deltas} delta commits ({t_ingest:.1f}s "
            f"ingest) -> {n_files_before} files; lookup "
            f"{t_before*1000:.0f}ms | compact() replaced {replaced} "
            f"files in {t_compact:.1f}s -> {n_files_after} files; "
            f"lookup {t_after*1000:.0f}ms "
            f"({t_before/max(t_after,1e-9):.1f}x faster)"
        )


if __name__ == "__main__":
    main()
