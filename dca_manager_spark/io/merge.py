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

import shutil
import tempfile
import uuid
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

    def register(self, name: str) -> None:
        """Catalog sync (A14 parity, load_transactions.py:73-79): make the
        table addressable from ``spark.sql``."""
        self.read().createOrReplaceTempView(name)

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

        if merged.isEmpty():
            # Every affected partition lost all rows (e.g. a full-partition
            # delete): nothing to write — just clear the directories.
            if self.partition_by:
                self._delete_partition_dirs(part_rows)
            return

        # COPY_ON_WRITE rewrite: stage to a temp dir (a plan cannot overwrite
        # its own input path), then dynamic-partition-overwrite the table so
        # ONLY the affected partitions are replaced.
        stage = Path(tempfile.gettempdir()) / f"mergetable-stage-{uuid.uuid4().hex}"
        try:
            self._writer(merged, "overwrite").save(str(stage))
            staged = self.spark.read.parquet(str(stage))
            self._writer(staged, "overwrite").save(self.path)
            if self.partition_by:
                # Dynamic overwrite only replaces partitions PRESENT in the
                # output — an affected partition whose rows were all removed
                # (key moved under a global index, or a full-partition
                # delete) must be cleared explicitly.
                remaining = {
                    tuple(row[c] for c in self.partition_by)
                    for row in staged.select(*self.partition_by).distinct().collect()
                }
                self._delete_partition_dirs(part_rows - remaining)
        finally:
            shutil.rmtree(stage, ignore_errors=True)

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

    def _upsert(self, df: DataFrame) -> None:
        batch = precombine_dedup(df, self.keys, self.precombine)
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
        )
        stage = Path(tempfile.gettempdir()) / f"mergetable-compact-{uuid.uuid4().hex}"
        try:
            self._writer(current, "overwrite").save(str(stage))
            staged = self.spark.read.parquet(str(stage))
            self._writer(staged, "overwrite").save(self.path)
        finally:
            shutil.rmtree(stage, ignore_errors=True)

    def file_count(self) -> int:
        return sum(1 for _ in Path(self.path).rglob("*.parquet"))

    def _delete(self, df: DataFrame) -> None:
        if not self.exists():
            return
        batch = precombine_dedup(df, self.keys, self.precombine)
        self._merge_existing(batch, keep_batch=False)
