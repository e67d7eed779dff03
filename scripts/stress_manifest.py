"""ManifestTable incremental-read stress probe (SCALE.md).

Bulk-loads REPLICAS x sf0.1 lineitem (~600k rows at the default) into a
manifest table partitioned by l_returnflag (3 fat partitions — the
worst case for file-level COW incremental pull), then upserts a
BATCH-row batch into ONE partition and compares the two incremental
consumers:

- file-level (COW): re-reads every row of the touched partition;
- record-level:     reads exactly the captured change set.

Also reports the change-capture overhead of the upsert commit itself
(the O(batch) changefile write) against the COW rewrite it rides on.
At 100 TB a touched partition is ~TBs while a batch is ~MBs — the
rows-scanned ratio printed here is the quantity that scales by that
factor.

Second probe: COW vs MOR micro-batch ingest — N small upserts into the
fat-partition table. COW pays a full partition rewrite per commit; MOR
lands O(batch) delta files and pays at read/compaction instead. The
per-commit write time ratio printed here is what a minute-level
streaming ingest multiplies by commits/day at 100 TB.

Usage: python scripts/stress_manifest.py [replicas=10] [batch=10]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from dca_manager_spark.io.manifest import ManifestTable  # noqa: E402
from dca_manager_spark.io.readers import load_table  # noqa: E402
from dca_manager_spark.session import get_bench_session  # noqa: E402


def main() -> None:
    replicas = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_bench_session("manifest-stress")
    spark.sparkContext.setLogLevel("ERROR")

    import tempfile

    base = (
        load_table(spark, "/root/testdata/sf0.1", "lineitem")
        .select("l_orderkey", "l_linenumber", "l_returnflag", "l_extendedprice")
    )
    rows = []
    for r in range(replicas):
        rows.append(
            base.select(
                (F.col("l_orderkey") + F.lit(r * 100_000_000)).alias("l_orderkey"),
                "l_linenumber",
                "l_returnflag",
                "l_extendedprice",
            )
        )
    corpus = rows[0]
    for df in rows[1:]:
        corpus = corpus.unionByName(df)

    with tempfile.TemporaryDirectory() as tmp:
        table = ManifestTable(
            spark,
            f"{tmp}/li",
            keys=("l_orderkey", "l_linenumber"),
            precombine="l_orderkey",
            partition_by=("l_returnflag",),
        )
        t0 = time.perf_counter()
        table.write(corpus, "bulk_insert")
        t_load = time.perf_counter() - t0
        n = table.read().count()
        v0 = table.commits()[-1]

        batch = (
            table.read(partition_filter={"l_returnflag": "R"})
            .limit(batch_rows)
            .withColumn("l_extendedprice", F.col("l_extendedprice") + 1)
            .localCheckpoint(eager=True)
        )
        t0 = time.perf_counter()
        table.write(batch, "upsert")
        t_upsert = time.perf_counter() - t0

        t0 = time.perf_counter()
        file_rows = table.read_incremental(v0).count()
        t_file = time.perf_counter() - t0
        t0 = time.perf_counter()
        rec_rows = table.read_incremental(v0, records=True).count()
        t_rec = time.perf_counter() - t0

        assert rec_rows == batch_rows, (rec_rows, batch_rows)
        print(
            f"rows={n} load={t_load:.1f}s upsert={t_upsert:.1f}s | "
            f"incremental file-level: {file_rows} rows {t_file:.2f}s | "
            f"record-level: {rec_rows} rows {t_rec:.2f}s | "
            f"rows-scanned ratio {file_rows / max(rec_rows, 1):,.0f}x"
        )

    # -- COW vs MOR micro-batch ingest ------------------------------------
    n_commits = 5
    results = {}
    for ttype in ("cow", "mor"):
        with tempfile.TemporaryDirectory() as tmp:
            table = ManifestTable(
                spark,
                f"{tmp}/li",
                keys=("l_orderkey", "l_linenumber"),
                precombine="l_orderkey",
                partition_by=("l_returnflag",),
                table_type=ttype,
            )
            table.write(corpus, "bulk_insert")
            batch = (
                table.read(partition_filter={"l_returnflag": "R"})
                .limit(batch_rows)
                .localCheckpoint(eager=True)
            )
            t0 = time.perf_counter()
            for i in range(n_commits):
                table.write(
                    batch.withColumn(
                        "l_extendedprice", F.col("l_extendedprice") + i
                    ),
                    "upsert",
                )
            t_writes = time.perf_counter() - t0
            t0 = time.perf_counter()
            n_read = table.read().count()
            t_read = time.perf_counter() - t0
            t_compact = None
            if ttype == "mor":
                t0 = time.perf_counter()
                table.compact()
                t_compact = time.perf_counter() - t0
            results[ttype] = (t_writes, t_read, n_read, t_compact)
    cw, cr, cn, _ = results["cow"]
    mw, mr, mn, mc = results["mor"]
    assert cn == mn, (cn, mn)
    print(
        f"micro-batch ingest x{n_commits} ({batch_rows} rows each): "
        f"COW writes {cw:.1f}s read {cr:.1f}s | "
        f"MOR writes {mw:.1f}s read {mr:.1f}s compact {mc:.1f}s | "
        f"per-commit write ratio {cw / max(mw, 1e-9):.1f}x"
    )

    # -- Section 3 (VERDICT r11 #10): MOR compaction interleaved with ---
    # keyed upserts and incremental reads. A COW twin receives the SAME
    # batch sequence; after every interleaving (upserts before, between,
    # and after compactions) the MOR resolve must equal the COW state
    # row-for-row, record-level incremental reads spanning a compaction
    # commit must surface exactly the upserted change rows (compaction
    # captures no changes), and a final compact must change nothing.
    clean = (
        corpus.groupBy("l_orderkey", "l_linenumber")
        .agg(
            F.max("l_extendedprice").alias("l_extendedprice"),
            F.max("l_returnflag").alias("l_returnflag"),
        )
        .localCheckpoint(eager=True)
    )
    import tempfile as _tf

    with _tf.TemporaryDirectory() as tc, _tf.TemporaryDirectory() as tm:
        tables = {}
        for ttype, tmp in (("cow", tc), ("mor", tm)):
            tables[ttype] = ManifestTable(
                spark,
                f"{tmp}/li",
                keys=("l_orderkey", "l_linenumber"),
                precombine="l_extendedprice",
                partition_by=("l_returnflag",),
                table_type=ttype,
            )
            tables[ttype].write(clean, "bulk_insert")
        rounds, n_compacts = 8, 0
        t0 = time.perf_counter()
        for i in range(rounds):
            batch = (
                clean.filter(F.col("l_orderkey") % 97 == i)
                .withColumn(
                    "l_extendedprice", F.col("l_extendedprice") + i + 1
                )
                .localCheckpoint(eager=True)
            )
            n_batch = batch.select("l_orderkey", "l_linenumber").distinct().count()
            since = tables["mor"].commits()[-1]
            for ttype in ("cow", "mor"):
                tables[ttype].write(batch, "upsert")
            if i % 3 == 1:
                tables["mor"].compact()
                n_compacts += 1
            # record-level incremental spanning the (possible) compaction
            inc = tables["mor"].read_incremental(since, records=True).count()
            assert inc == n_batch, (i, inc, n_batch)
        tables["mor"].compact()
        n_compacts += 1
        diff = (
            tables["mor"].read().exceptAll(tables["cow"].read()).count()
            + tables["cow"].read().exceptAll(tables["mor"].read()).count()
        )
        t_sec3 = time.perf_counter() - t0
        assert diff == 0, f"MOR diverged from COW by {diff} rows"
        print(
            f"interleaved MOR: {rounds} upserts + {n_compacts} compactions "
            f"in {t_sec3:.1f}s — record-incremental exact at every step, "
            f"final state == COW twin ({tables['mor'].read().count()} rows)"
        )

    # -- Section 4 (VERDICT r12 #3): multi-writer contention. Four ------
    # threads x 6 upserts race on ONE table with optimistic rebase; every
    # commit must land (ids strictly sequential, no publish clobbered),
    # the final content must be the union of all writers' keys, and the
    # rebase counter shows how much contention the put-if-absent loop
    # actually absorbed. At 100 TB this is streaming ingest + backfill +
    # compactor sharing a table; the printed retries/commit is the knob
    # check for commit_retries sizing.
    import threading as _th

    n_threads, n_commits_each = 4, 6
    with _tf.TemporaryDirectory() as tmp:
        handles = [
            ManifestTable(
                spark,
                f"{tmp}/li",
                keys=("l_orderkey", "l_linenumber"),
                precombine="l_extendedprice",
                partition_by=("l_returnflag",),
                commit_retries=2 * n_threads * n_commits_each,
            )
            for _ in range(n_threads)
        ]
        handles[0].write(clean.limit(1000), "bulk_insert")
        seed_keys = 1000
        errs: list[Exception] = []
        gate = _th.Barrier(n_threads)

        def hammer(tid: int) -> None:
            try:
                gate.wait(timeout=120)
                for i in range(n_commits_each):
                    batch = (
                        clean.filter(
                            F.col("l_orderkey") % (n_threads * 13)
                            == tid * 13 + (i % 13)
                        )
                        .limit(50)
                        .withColumn(
                            "l_extendedprice",
                            F.col("l_extendedprice") + tid * 1000 + i,
                        )
                    )
                    handles[tid].write(batch, "upsert")
            except Exception as exc:  # noqa: BLE001 - surfaced below
                errs.append(exc)

        t0 = time.perf_counter()
        threads = [
            _th.Thread(target=hammer, args=(t,)) for t in range(n_threads)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(600)
        t_sec4 = time.perf_counter() - t0
        assert not errs, errs
        commits = handles[0].commits()
        n_expected = 1 + n_threads * n_commits_each
        assert commits == list(range(n_expected)), (
            len(commits), n_expected)
        total_rebases = sum(h.rebase_count for h in handles)
        n_rows = handles[0].read().count()
        assert n_rows >= seed_keys, n_rows
        print(
            f"multi-writer: {n_threads} threads x {n_commits_each} upserts "
            f"in {t_sec4:.1f}s — {len(commits)} sequential commits, "
            f"{total_rebases} rebases "
            f"({total_rebases / (n_threads * n_commits_each):.2f}/commit), "
            f"{n_rows} rows, zero lost updates"
        )

    # -- Section 5 (VERDICT r14 #8): streaming ingest vs predicate DML. -
    # The realistic lakehouse contention case: a checkpointed
    # stream_upsert loop (rate source -> MOR micro-batch commits) races
    # a maintenance writer running update_where / delete_where on the
    # SAME table. Writers are ROW-disjoint by key zone — the streaming
    # zone (k < 500), an update zone (500-749), delete slices (750+) —
    # which is what makes "zero lost updates" EXACTLY checkable: every
    # writer's effect must survive every other writer's OCC rebases, so
    # after the dust settles (a) updated keys must show precisely
    # m_updates x +1000 (a streaming rebase that clobbered a DML commit
    # would lose increments), (b) deleted slices must stay deleted (a
    # DML rebase that clobbered a stream commit would resurrect them),
    # (c) every micro-batch the sink acknowledged must be readable at
    # its max-v per key (no stream commit lost to DML rebases). The
    # commit-level contention is real even though rows are disjoint —
    # rebases are triggered by the MANIFEST race, not row overlap.
    from dca_manager_spark.streaming.ingest import stream_upsert

    with _tf.TemporaryDirectory() as tmp:
        writer = ManifestTable(
            spark,
            f"{tmp}/t",
            keys=("k",),
            precombine="v",
            partition_by=(),
            table_type="mor",
            commit_retries=200,
        )
        dml = ManifestTable(
            spark,
            f"{tmp}/t",
            keys=("k",),
            precombine="v",
            partition_by=(),
            table_type="mor",
            commit_retries=200,
        )
        seed = spark.range(500, 1000).select(
            F.col("id").alias("k"), F.col("id").cast("long").alias("v")
        )
        writer.write(seed, "bulk_insert")

        ingested: dict[int, int] = {}
        ingest_lock = _th.Lock()

        class Recorder:
            """stream_upsert-compatible handle: delegate the write, then
            record what this micro-batch durably committed."""

            def write(self, df, op):
                rows = [(r.k, r.v) for r in df.collect()]
                writer.write(
                    spark.createDataFrame(rows, "k long, v long"), op
                )
                with ingest_lock:
                    for k, v in rows:
                        ingested[k] = max(ingested.get(k, -1), v)

        stream = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", "400")
            .load()
            .select(
                (F.col("value") % 500).alias("k"),
                (F.lit(1_000_000) + F.col("value")).alias("v"),
            )
        )
        q = stream_upsert(
            stream,
            Recorder(),
            f"{tmp}/ckpt",
            available_now=False,
            query_name="stress-ingest",
            # pace the ingest so the DML writer's rebase loop cannot be
            # starved by back-to-back stream commits (see stream_upsert)
            trigger_interval="2 seconds",
        )

        n_updates, n_deletes = 6, 4
        dml_secs: list[float] = []
        t0 = time.perf_counter()
        try:
            deadline = time.time() + 120
            for i in range(max(n_updates, n_deletes)):
                while not q.recentProgress and time.time() < deadline:
                    time.sleep(0.5)  # let the stream land its first batch
                td = time.perf_counter()
                if i < n_updates:
                    dml.update_where(
                        "k >= 500 AND k < 750",
                        {"v": F.col("v") + 1000},
                    )
                if i < n_deletes:
                    dml.delete_where(
                        f"k >= {750 + 50 * i} AND k < {750 + 50 * (i + 1)}"
                    )
                dml_secs.append(time.perf_counter() - td)
        finally:
            q.stop()
            q.awaitTermination(120)
        t_sec5 = time.perf_counter() - t0

        commits = writer.commits()
        assert commits == list(range(len(commits))), commits[-5:]
        final = {r.k: r.v for r in writer.read().collect()}
        # (a) every update survived every streaming rebase
        upd = {k: v for k, v in final.items() if 500 <= k < 750}
        assert len(upd) == 250, len(upd)
        bad_upd = {k: v for k, v in upd.items() if v != k + 1000 * n_updates}
        assert not bad_upd, f"lost updates: {dict(list(bad_upd.items())[:5])}"
        # (b) every delete survived (no resurrection by stream rebases)
        resurrected = [k for k in final if 750 <= k < 750 + 50 * n_deletes]
        assert not resurrected, f"resurrected keys: {resurrected[:10]}"
        survivors = [k for k in final if k >= 750 + 50 * n_deletes]
        assert len(survivors) == 250 - 50 * n_deletes, len(survivors)
        # (c) every acknowledged micro-batch is readable at max-v per key
        lost_stream = {
            k: (v, final.get(k))
            for k, v in ingested.items()
            if final.get(k) != v
        }
        assert not lost_stream, f"lost stream rows: {dict(list(lost_stream.items())[:5])}"
        total_rebases = writer.rebase_count + dml.rebase_count
        print(
            f"stream-vs-DML: {len(commits)} commits in {t_sec5:.1f}s "
            f"({len(ingested)} streamed keys, {n_updates} update_where + "
            f"{n_deletes} delete_where, median DML "
            f"{sorted(dml_secs)[len(dml_secs) // 2]:.2f}s/op), "
            f"{total_rebases} rebases (stream {writer.rebase_count} / DML "
            f"{dml.rebase_count}), zero lost updates, zero resurrections"
        )

    # -- Section 6 (r16): SQL general MERGE vs concurrent handle writer.
    # The full-grammar MERGE (io/manifest._merge_general) reads the
    # target, computes update/delete/insert sets, then publishes ONE
    # write_txn — the longest read-compute-publish window of any DML
    # path, so it is the most exposed to losing the commit race. Zones:
    # the MERGE touches keys < 300 (update half, delete quarter, insert
    # new 1000-1099), the handle writer hammers keys 500+. After both
    # finish: every MERGE effect AND every handle increment must be
    # present (the loser's rebase re-applies onto the winner's head),
    # commit history strictly sequential.
    from dca_manager_spark.io.manifest import manifest_sql

    with _tf.TemporaryDirectory() as tmp:
        mt = ManifestTable(
            spark, f"{tmp}/m", keys=("k",), precombine="v",
            partition_by=(), commit_retries=100,
        )
        other = ManifestTable(
            spark, f"{tmp}/m", keys=("k",), precombine="v",
            partition_by=(), commit_retries=100,
        )
        mt.write(
            spark.range(0, 800).select(
                F.col("id").alias("k"),
                F.col("id").cast("double").alias("v"),
            ),
            "bulk_insert",
        )
        mt.register("stress_merge_t")
        spark.range(0, 300).union(spark.range(1000, 1100)).select(
            F.col("id").alias("k"),
            (F.col("id") + 0.5).cast("double").alias("nv"),
        ).createOrReplaceTempView("stress_merge_src")

        merge_err: list[Exception] = []
        n_handle_commits = 6

        def handle_hammer() -> None:
            try:
                for i in range(n_handle_commits):
                    other.write(
                        spark.range(500, 560).select(
                            F.col("id").alias("k"),
                            (F.lit(10_000.0 * (i + 1)) + F.col("id"))
                            .alias("v"),
                        ),
                        "upsert",
                    )
            except Exception as exc:  # noqa: BLE001 - surfaced below
                merge_err.append(exc)

        t0 = time.perf_counter()
        th = _th.Thread(target=handle_hammer)
        th.start()
        try:
            manifest_sql(spark, """
                MERGE INTO stress_merge_t t USING stress_merge_src s
                ON t.k = s.k
                WHEN MATCHED AND s.k % 4 = 0 THEN DELETE
                WHEN MATCHED THEN UPDATE SET v = s.nv
                WHEN NOT MATCHED THEN INSERT (k, v) VALUES (s.k, s.nv)
            """)
        except Exception as exc:  # noqa: BLE001
            merge_err.append(exc)
        th.join(600)
        t_sec6 = time.perf_counter() - t0
        assert not merge_err, merge_err
        final6 = {r.k: r.v for r in mt.read().collect()}
        # MERGE effects: deletes gone, updates applied, inserts present
        assert all(k not in final6 for k in range(0, 300, 4))
        upd_bad = {
            k: final6.get(k)
            for k in range(300) if k % 4 != 0 and final6.get(k) != k + 0.5
        }
        assert not upd_bad, f"lost MERGE updates: {dict(list(upd_bad.items())[:5])}"
        assert all(final6.get(k) == k + 0.5 for k in range(1000, 1100))
        # handle effects: the LAST upsert's values survived the race
        hammer_bad = {
            k: final6.get(k)
            for k in range(500, 560)
            if final6.get(k) != 10_000.0 * n_handle_commits + k
        }
        assert not hammer_bad, f"lost handle upserts: {dict(list(hammer_bad.items())[:5])}"
        commits6 = mt.commits()
        assert commits6 == list(range(len(commits6))), commits6
        mt.unregister("stress_merge_t")
        spark.catalog.dropTempView("stress_merge_src")
        print(
            f"merge-vs-handle: SQL MERGE (75 del / 225 upd / 100 ins) vs "
            f"{n_handle_commits} concurrent handle upserts in {t_sec6:.1f}s "
            f"— {len(commits6)} sequential commits, rebases (merge "
            f"{mt.rebase_count} / handle {other.rebase_count}), zero lost "
            f"effects on either side"
        )


if __name__ == "__main__":
    main()
