"""Keyed upsert/merge table — Hudi-parity semantics on plain Parquet.

The reference's analytics table is a Hudi COPY_ON_WRITE table with a
composite record key, a precombine tie-break, and four write operations
(glue/scripts/load_transactions.py:56-80,113-122; SURVEY §1.5):

- record key       : (transaction_id, close_time)  [ComplexKeyGenerator, :57,:68]
- precombine field : transaction_id — when two incoming rows share a key in
  one batch, the LARGER precombine value wins (:58)
- operations       : insert | upsert | bulk_insert | delete (:48-51,:117-122)
- table type       : COPY_ON_WRITE (:64) — touched files are rewritten

Hudi 0.10 default combine behavior is honored: ``insert`` and
``bulk_insert`` do NOT deduplicate (duplicate rows are legal table states —
SURVEY §7 hard part #2); ``upsert`` and ``delete`` combine by key first.

Spark-first design (no Hudi/Delta jars needed):
- COPY_ON_WRITE == rewrite only the partitions the batch touches, via
  ``spark.sql.sources.partitionOverwriteMode=dynamic``.
- The merge itself is a null-safe left-anti join (existing rows whose key is
  NOT in the batch) unioned with the combined batch.
- At 100 TB the existing side is huge and the batch is small: the anti join
  broadcasts the batch's key set, and partition pruning limits the rewrite
  to affected partitions only. No full-table shuffle ever happens.
"""

from __future__ import annotations

from enum import Enum
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window
from pyspark.sql import functions as F


class WriteOperation(str, Enum):
    INSERT = "insert"
    UPSERT = "upsert"
    BULK_INSERT = "bulk_insert"
    DELETE = "delete"

    @classmethod
    def parse(cls, value: str) -> "WriteOperation":
        """Validate like the reference job does (load_transactions.py:48-51)."""
        try:
            return cls(value)
        except ValueError as exc:
            raise ValueError(
                f"write_operation must be one of "
                f"{[op.value for op in cls]}, got {value!r}"
            ) from exc


def precombine_dedup(df: DataFrame, keys: list[str], precombine: str,
                     tiebreaks: list[str] | None = None) -> DataFrame:
    """Hudi precombine: one survivor per key, largest precombine value wins
    (load_transactions.py:58). Hudi leaves ties arbitrary; pass ``tiebreaks``
    (further descending columns) when a deterministic survivor is required.
    """
    order = [F.col(precombine).desc()] + [F.col(c).desc() for c in (tiebreaks or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


class MergeTable:
    """A keyed, partitioned, copy-on-write Parquet table."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: tuple[str, ...] = ("transaction_id", "close_time"),
        precombine: str = "transaction_id",
        partition_by: tuple[str, ...] = ("pair",),
        global_index: bool = False,
    ) -> None:
        """``global_index`` mirrors Hudi's index scoping: False (default,
        = Hudi's partition-scoped BLOOM/SIMPLE index and therefore
        reference parity) resolves keys only within the incoming row's
        partition — a key that ARRIVES with a new partition value becomes a
        second row, the old partition's row survives. True (= Hudi
        GLOBAL_* index) resolves keys across all partitions: the old row is
        removed wherever it lives. Global costs one extra key-locate pass
        over the table (broadcast semi join, key-pushdown-friendly)."""
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.precombine = precombine
        self.partition_by = list(partition_by)
        self.global_index = global_index

    # -- read side ----------------------------------------------------------
    def exists(self) -> bool:
        p = Path(self.path)
        return p.exists() and any(p.rglob("*.parquet"))

    def read(self) -> DataFrame:
        # mergeSchema: schema evolution support — batches may add columns
        # over the table's life (Hudi evolves schemas too); older files
        # surface the new columns as nulls.
        return self.spark.read.option("mergeSchema", "true").parquet(self.path)

    def register(self, name: str, durable: bool = True) -> None:
        """Catalog sync (A14 parity): make the table addressable from
        ``spark.sql``.

        ``durable=True`` (default) registers an EXTERNAL table entry in the
        session catalog — the engine analogue of the reference's Hudi
        hive-sync into the Glue catalog (glue/scripts/load_transactions.py:73-79,
        database ``dca_manager`` terraform/glue.tf:119-122). The entry
        outlives this SparkSession: any session sharing the metastore
        (``spark.sql.catalogImplementation=hive`` -> a NEW process over the
        same metastore; in-memory catalog -> any ``newSession()``) can
        ``spark.sql`` the table by name. Drop-and-recreate keeps the sync
        idempotent and re-infers evolved schemas; MSCK repair discovers
        hive-style partitions — both metadata-only, exactly what hive-sync
        redoes on every reference Glue run.

        ``durable=False`` is the session-scoped temp-view registration.
        """
        if not durable:
            self.read().createOrReplaceTempView(name)
            return
        parts = name.split(".")
        quoted = ".".join(f"`{p}`" for p in parts)
        if len(parts) > 1:
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{parts[0]}`")
        location = (
            self.path
            if "://" in self.path
            else str(Path(self.path).absolute())
        )
        # re-sync owns the name whatever its prior kind: a VIEW under it
        # (a ManifestTable.register from the other table format) blocks
        # DROP TABLE, so drop the matching entity first
        try:
            entry = self.spark.catalog.getTable(name)
            drop_kind = "VIEW" if entry.tableType == "VIEW" else "TABLE"
        except Exception:
            drop_kind = "TABLE"  # no prior entry
        self.spark.sql(f"DROP {drop_kind} IF EXISTS {quoted}")
        self.spark.sql(f"CREATE TABLE {quoted} USING PARQUET LOCATION '{location}'")
        if self.partition_by:
            self.spark.sql(f"MSCK REPAIR TABLE {quoted}")

    # -- write side ---------------------------------------------------------
    def write(self, df: DataFrame, operation: str | WriteOperation) -> None:
        op = WriteOperation.parse(operation if isinstance(operation, str) else operation.value)
        if op in (WriteOperation.INSERT, WriteOperation.BULK_INSERT):
            # No combine-before-insert (Hudi 0.10 default): duplicates land.
            self._append(df)
        elif op == WriteOperation.UPSERT:
            self._upsert(df)
        else:
            self._delete(df)

    def _writer(self, df: DataFrame, mode: str):
        writer = df.write.mode(mode)
        if self.partition_by:
            writer = writer.partitionBy(*self.partition_by)
        return writer.format("parquet")

    def _append(self, df: DataFrame) -> None:
        self._writer(df, "append").save(self.path)

    def _key_predicate(self) -> F.Column:
        # Null-safe: close_time can be null on malformed rows.
        pred = F.lit(True)
        for k in self.keys:
            pred = pred & F.col(f"e.{k}").eqNullSafe(F.col(f"b.{k}"))
        return pred

    def _merge_existing(self, batch: DataFrame, keep_batch: bool) -> None:
        """Rewrite affected partitions as (existing - batch keys) [+ batch]."""
        existing = self.read()
        keys_df = batch.select(*self.keys).distinct()
        if self.partition_by:
            # Prune the rewrite to partitions the batch touches. The batch is
            # small relative to the table; collecting its distinct partition
            # values is bounded by the partition count, not the data size.
            part_rows = {
                tuple(row[c] for c in self.partition_by)
                for row in batch.select(*self.partition_by).distinct().collect()
            }
            if self.global_index:
                # Global key resolution: also rewrite partitions where OLD
                # versions of the batch's keys live (key moved partitions).
                located = (
                    self.read()
                    .alias("e")
                    .join(F.broadcast(keys_df.alias("b")), self._key_predicate(), "left_semi")
                    .select(*self.partition_by)
                    .distinct()
                    .collect()
                )
                part_rows |= {
                    tuple(row[c] for c in self.partition_by) for row in located
                }
            pred = F.lit(False)
            for values in part_rows:
                clause = F.lit(True)
                for col, value in zip(self.partition_by, values):
                    clause = clause & F.col(col).eqNullSafe(F.lit(value))
                pred = pred | clause
            existing = existing.filter(pred)
        survivors = existing.alias("e").join(
            F.broadcast(keys_df.alias("b")), self._key_predicate(), "left_anti"
        )
        merged = (
            survivors.unionByName(batch, allowMissingColumns=True)
            if keep_batch
            else survivors
        )

        # COPY_ON_WRITE rewrite, SINGLE write: materialize the merged rows
        # to executor-local storage first (localCheckpoint truncates the
        # lineage back to the table's own files — a plan cannot overwrite
        # its input), then dynamic-partition-overwrite the table in one
        # write so only the affected partitions are replaced. r1/r2 staged
        # to a temp dir and rewrote — 2x write amplification per merge.
        #
        # Failure semantics: the overwrite commits partition directories at
        # job commit (Hadoop commit protocol) — a task/job failure before
        # commit leaves the table intact, and losing the (non-replicated)
        # checkpoint blocks fails the job rather than corrupting the table;
        # the caller retries the whole merge. On object stores dir-commit
        # is copy-based and not atomic across partitions — a production S3
        # deployment wants a manifest/table format (Delta/Hudi/Iceberg)
        # commit instead; see the sketch in SCALE.md.
        merged = merged.localCheckpoint(eager=True)
        if merged.isEmpty():
            # Every affected partition lost all rows (e.g. a full-partition
            # delete): nothing to write — just clear the directories.
            if self.partition_by:
                self._delete_partition_dirs(part_rows)
            return
        (
            self._writer(merged, "overwrite")
            # Per-write option: correctness must not depend on session conf
            # (the reference's job sets its Hudi write configs per-write too).
            .option("partitionOverwriteMode", "dynamic")
            .save(self.path)
        )
        if self.partition_by:
            # Dynamic overwrite only replaces partitions PRESENT in the
            # output — an affected partition whose rows were all removed
            # (key moved under a global index, or a full-partition
            # delete) must be cleared explicitly.
            remaining = {
                tuple(row[c] for c in self.partition_by)
                for row in merged.select(*self.partition_by).distinct().collect()
            }
            self._delete_partition_dirs(part_rows - remaining)

    def _delete_partition_dirs(self, parts: set[tuple]) -> None:
        """Remove emptied partition directories via the Hadoop FS API (works
        on any supported filesystem, not just local)."""
        if not parts:
            return
        jvm = self.spark._jvm  # type: ignore[attr-defined]
        conf = self.spark._jsc.hadoopConfiguration()  # type: ignore[attr-defined]
        for values in parts:
            subdir = "/".join(
                f"{col}={value}" for col, value in zip(self.partition_by, values)
            )
            hpath = jvm.org.apache.hadoop.fs.Path(f"{self.path}/{subdir}")
            fs = hpath.getFileSystem(conf)
            fs.delete(hpath, True)

    def _pin(self, df: DataFrame) -> DataFrame:
        """Materialize the incoming batch once. The merge path consumes the
        batch several times (key set, partition values, union); without
        pinning, a nondeterministic input (sample/limit/shuffled source)
        would be re-evaluated differently per consumer and silently
        corrupt the merge. Hudi materializes incoming batches too. The
        batch is small relative to the table — this is O(batch)."""
        return df.localCheckpoint(eager=True)

    def _upsert(self, df: DataFrame) -> None:
        batch = precombine_dedup(self._pin(df), self.keys, self.precombine)
        if not self.exists():
            self._append(batch)
            return
        self._merge_existing(batch, keep_batch=True)

    # -- maintenance --------------------------------------------------------
    def compact(self, target_files_per_partition: int = 1) -> None:
        """Small-file compaction: rewrite every partition into N files.

        The reference's load pattern (one Glue run per order file,
        cmd/process_orders/main.go:241) grows tiny files without bound;
        Hudi compacts internally — here compaction is an explicit rewrite.
        At scale, run per-partition on a schedule; content is unchanged.
        """
        current = self.read().repartition(
            target_files_per_partition, *(self.partition_by or self.keys)
        ).localCheckpoint(eager=True)  # single write; see _merge_existing
        (
            self._writer(current, "overwrite")
            # Full-table rewrite: static overwrite truncates the whole path.
            .option("partitionOverwriteMode", "static")
            .save(self.path)
        )

    def file_count(self) -> int:
        return sum(1 for _ in Path(self.path).rglob("*.parquet"))

    def _delete(self, df: DataFrame) -> None:
        if not self.exists():
            return
        batch = precombine_dedup(self._pin(df), self.keys, self.precombine)
        self._merge_existing(batch, keep_batch=False)
