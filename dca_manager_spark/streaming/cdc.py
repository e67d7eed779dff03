"""Streaming CDC follower: tail a ManifestTable's commit timeline and
apply each new commit's change feed downstream — the lake-to-lake
replication loop (Delta CDF streaming-source / Hudi incremental-ETL
analogue, re-expressed over the engine's manifest timeline).

Why NOT a plain ``readStream`` glob over ``_changes/``: change files are
written BEFORE the manifest publish (crash-pre-publish leaves orphans
that batch readers never see, and append commits capture their changes
as references to their own data files — no ``_changes`` file at all).
A file-source glob would therefore both ingest uncommitted orphans and
miss appends entirely. Delta's streaming source has the same problem and
the same answer: list files through the LOG, not the directory. Here the
log is the manifest timeline, so the follower is a manifest-aware
micro-batch loop:

    poll commits() -> read_cdc(since=cursor) bounded to the polled head
    -> apply -> atomically advance the durable cursor

Exactly-once story (same shape as streaming/ingest.py):
- the cursor is advanced by atomic rename AFTER the apply completes, so
  a crash between apply and cursor-advance replays the commit range —
  AT-LEAST-ONCE delivery;
- ``replicate()``'s sink is ``apply_cdc`` (keyed upsert / keyed delete
  per source commit), which is IDEMPOTENT under replay;
- at-least-once + idempotent apply = exactly-once replica state.
Custom ``apply_fn`` sinks own their half of that contract and must be
idempotent per commit range.

Scale notes: each batch reads ONLY the captured change rows of the new
commits (record-level capture is O(batch) per commit — io/manifest.py),
never the table; the poll touches manifest JSONs (metadata-scale). The
driver-side loop is bounded by commit count, not rows — the same bound
as apply_cdc. ``max_commits`` caps a batch for backpressure when a
follower resumes far behind the head.
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class CdcFollower:
    """Durable cursor over a source ManifestTable's commit timeline.

    ``checkpoint_path`` holds the last APPLIED commit id as JSON; the
    follower resumes from there across process restarts. A fresh follower
    starts BEFORE history (cursor -1) and bootstraps from commit 0 — only
    valid while commit 0 is retained (vacuum truncates history; bootstrap
    a late-joining follower from a full read + ``commits()[-1]`` cursor
    via ``seek()`` instead).
    """

    def __init__(self, source, checkpoint_path: str) -> None:
        self.source = source
        self.checkpoint_path = Path(checkpoint_path)

    def position(self) -> int:
        """Last applied source commit id; -1 = nothing applied yet."""
        if not self.checkpoint_path.is_file():
            return -1
        with open(self.checkpoint_path) as fh:
            return int(json.load(fh)["last_applied"])

    def seek(self, commit_id: int) -> None:
        """Set the cursor without applying (bootstrap/replay control)."""
        self._advance(commit_id)

    def _advance(self, commit_id: int) -> None:
        self.checkpoint_path.parent.mkdir(parents=True, exist_ok=True)
        tmp = self.checkpoint_path.with_suffix(".tmp")
        with open(tmp, "w") as fh:
            json.dump({"last_applied": int(commit_id)}, fh)
        os.replace(tmp, self.checkpoint_path)  # atomic cursor commit

    def run_once(
        self,
        apply_fn: Callable[[DataFrame, int, int], None],
        max_commits: int | None = None,
    ) -> int:
        """Apply every unseen committed change batch (up to
        ``max_commits``) and advance the cursor. Returns the number of
        source commits applied (0 = caught up). ``apply_fn`` receives
        (feed, from_exclusive, to_inclusive) where ``feed`` is the
        ``read_cdc``-shaped frame for exactly that commit range."""
        if max_commits is not None and max_commits < 1:
            raise ValueError(f"max_commits must be >= 1, got {max_commits}")
        cursor = self.position()
        pending = [c for c in self.source.commits() if c > cursor]
        if not pending:
            return 0
        if max_commits is not None:
            pending = pending[:max_commits]
        head = pending[-1]
        # The head is pinned BEFORE the read: commits that land while the
        # batch is being applied wait for the next poll, so the cursor
        # always describes a fully-applied prefix of the timeline.
        feed = self.source.read_cdc(since=cursor).filter(F.col("_commit") <= head)
        apply_fn(feed, cursor, head)
        self._advance(head)
        return len(pending)


def feed_deltas(feed: DataFrame) -> DataFrame:
    """Turn a ``read_cdc`` feed into signed row deltas for INCREMENTAL
    AGGREGATE maintenance: +1 for an upsert/insert postimage, -1 for an
    ``update_preimage`` or ``delete`` before-image. Summing
    ``value * _delta`` (and ``_delta`` for counts) grouped by key over
    the feed advances any SUM/COUNT-shaped aggregate to the source's new
    state without recomputing from the table — the materialized-view
    maintenance pattern over the change feed. Requires the source to
    capture preimages (all commits since CDF parity; older commits'
    upserts would double-count their overwritten versions)."""
    return feed.withColumn(
        "_delta",
        F.when(F.col("_change_type") == "upsert", F.lit(1)).otherwise(F.lit(-1)),
    )


def replicate(
    source,
    replica,
    checkpoint_path: str,
    max_commits: int | None = None,
) -> int:
    """One replication micro-batch: tail ``source``'s CDC feed into
    ``replica`` via ``apply_cdc`` (commit-ordered keyed upserts/deletes),
    resuming from the durable cursor. Run in a poll loop (or per
    orchestrator tick) for continuous lake-to-lake replication; returns
    the number of source commits applied this call."""
    follower = CdcFollower(source, checkpoint_path)
    return follower.run_once(
        lambda feed, lo, hi: replica.apply_cdc(feed), max_commits=max_commits
    )


def replicate_stream(
    spark,
    source_path: str,
    replica,
    checkpoint: str,
    starting_commit: int | None = None,
    available_now: bool = True,
    trigger_interval: str | None = None,
    _fault=None,
):
    """``CdcFollower``'s datasource-native twin (r15 — VERDICT r14 #5):
    continuous lake-to-lake replication as a STRUCTURED STREAMING query
    over the ``dca_table_changes`` source (io/datasource.py) instead of a
    hand-rolled poll loop — Spark owns the offset log, batch scheduling,
    trigger cadence and restart semantics, exactly how Delta's CDF
    streaming source feeds a ``foreachBatch`` MERGE.

    Exactly-once story (the streaming half of CdcFollower's contract):
    - the source's offsets are commit ids; Spark's checkpoint WAL makes a
      micro-batch's commit range durable BEFORE it runs and marks it done
      only AFTER ``foreachBatch`` returns — a crash mid-apply REPLAYS the
      whole batch on restart (at-least-once);
    - the sink is ``apply_cdc``: commit-ordered keyed upserts/deletes,
      IDEMPOTENT under replay (re-upserting the same postimages and
      re-deleting absent keys are both no-ops on the resolved state);
    - at-least-once delivery + idempotent apply = the replica CONVERGES
      to the source state exactly once, across any kill/restart point
      (pinned by tests/test_streaming_cdc.py's fault-injection restart).

    A micro-batch may span several source commits; ``apply_cdc`` applies
    them in ``_commit`` order, so intra-batch ordering is preserved and
    cross-batch ordering is Spark's serialized-batch guarantee. The
    replica's manifest HISTORY under replay differs (extra no-op
    commits); its resolved state per key does not — same trade Delta
    makes replaying a MERGE.

    ``available_now=True`` drains everything committed so far and stops
    (the catch-up/batch-backfill trigger); False runs continuously —
    pass ``trigger_interval`` ("5 seconds") to pace the poll, and pace
    it at or above the replica's commit latency when the replica has
    OTHER writers (same rebase-starvation rule as
    streaming/ingest.stream_upsert). ``_fault`` is test-only fault
    injection, called after each applied batch BEFORE Spark marks it
    done. Returns the StreamingQuery."""
    reader = spark.readStream.format("dca_table_changes").option(
        "path", str(source_path)
    )
    if starting_commit is not None:
        reader = reader.option("startingCommit", str(starting_commit))

    def _apply(batch: DataFrame, batch_id: int) -> None:
        replica.apply_cdc(batch)
        if _fault is not None:
            _fault(batch, batch_id)

    writer = (
        reader.load()
        .writeStream.foreachBatch(_apply)
        .option("checkpointLocation", str(checkpoint))
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    elif trigger_interval:
        writer = writer.trigger(processingTime=trigger_interval)
    return writer.start()
