"""File-backed queue emulating the reference's SQS stage (SURVEY A11/A12).

The reference publishes ``PendingOrders`` bodies with string attributes
Exchange/TransactionId/Real to SQS (pkg/orders/submit_pending.go:24-64) and
consumes them in a lambda that acks with DeleteMessage per message
(cmd/process_orders/main.go:105-111,269-278).

Here the queue is a directory of one-JSON-file-per-message (attributes are
ordinary fields — SURVEY §1.1 queue-message mapping):

- batch mode  : ``consume()`` lists messages; ``ack()`` deletes the file —
  exactly SQS's at-least-once + explicit-delete contract. A message read
  but never acked is redelivered to the next consumer (visibility-timeout
  analog: no lease is taken, so redelivery is immediate).
- stream mode : ``as_stream(spark)`` exposes the same directory as a
  Structured Streaming file source; the ack becomes the checkpoint commit
  (SURVEY A12 'ack = checkpoint commit').
"""

from __future__ import annotations

import json
import time
import uuid
from pathlib import Path
from typing import Any

from pyspark.sql import DataFrame, SparkSession

from dca_manager_spark.schemas import QUEUE_MESSAGE_SCHEMA


class FileQueue:
    def __init__(self, path: str) -> None:
        self.path = Path(path)
        self.path.mkdir(parents=True, exist_ok=True)
        self._counter_file = self.path / ".last_published"

    def _next_nanos(self) -> int:
        """Monotonic name counter. Raw ``time.time_ns()`` alone is NOT
        monotonic across NTP step-backs or cross-process clock skew — a
        name below the stream reader's committed watermark used to be
        permanently skippable. The counter is max(wall clock, persisted
        last + 1, max existing name + 1): wall clock keeps names roughly
        time-meaningful, the persisted floor survives restarts, and the
        directory scan floor covers a missing/deleted counter file (queue
        dirs are control-plane small, so the scan is cheap).

        The read-bump-write runs under an advisory ``flock`` so a pair
        of concurrent publishers cannot interleave and move the counter
        BACKWARD (last-writer-wins with a smaller nanos would re-open
        the below-watermark window for every later publish). The tmp
        file has a FIXED name inside the critical section — a crash
        leaves at most one, overwritten by the next publish, never an
        accumulating leak."""
        import fcntl

        with open(self.path / ".last_published.lock", "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            floor = 0
            try:
                floor = int(self._counter_file.read_text())
            except (FileNotFoundError, ValueError):
                prefixes = [
                    int(f.name.split("-", 1)[0])
                    for f in self.path.glob("*.json")
                    if f.name.split("-", 1)[0].isdigit()
                ]
                if prefixes:
                    floor = max(prefixes)
            nanos = max(time.time_ns(), floor + 1)
            tmp = self.path / ".last_published.tmp"
            tmp.write_text(str(nanos))
            tmp.rename(self._counter_file)  # atomic counter advance
            return nanos

    # -- producer side (A11) ------------------------------------------------
    def publish(
        self,
        transaction_id: str,
        s3_bucket: str,
        s3_key: str,
        exchange: str,
        real: bool,
    ) -> str:
        """Publish a PendingOrders envelope (submit_pending.go:31-48):
        body fields + Exchange/TransactionId/Real attributes flattened."""
        # Monotonic name: FIFO listing order AND a totally-ordered offset
        # for the dca_queue streaming source (io/datasource.py) — the max
        # delivered name is a valid high-watermark. uuid suffix breaks
        # same-nanosecond ties. _next_nanos is clock-skew-safe (persisted
        # monotonic counter, not raw wall clock).
        msg_id = f"{self._next_nanos():020d}-{uuid.uuid4().hex}"
        body = {
            "transaction_id": transaction_id,
            "s3_bucket": s3_bucket,
            "s3_key": s3_key,
            "exchange": exchange,
            "real": "true" if real else "false",
        }
        target = self.path / f"{msg_id}.json"
        tmp = self.path / f".{msg_id}.tmp"
        tmp.write_text(json.dumps(body))
        tmp.rename(target)  # atomic publish: consumers never see partials
        return msg_id

    # -- consumer side (A12) ------------------------------------------------
    def consume(self) -> list[dict[str, Any]]:
        """List available messages (at-least-once: unacked messages show up
        again on the next consume)."""
        out = []
        for f in sorted(self.path.glob("*.json")):
            msg = json.loads(f.read_text())
            msg["__msg_id"] = f.stem
            out.append(msg)
        return out

    def ack(self, msg_id: str) -> None:
        """DeleteMessage parity (main.go:269-278)."""
        (self.path / f"{msg_id}.json").unlink(missing_ok=True)

    def size(self) -> int:
        return sum(1 for _ in self.path.glob("*.json"))

    # -- streaming view -----------------------------------------------------
    def as_stream(self, spark: SparkSession, max_files_per_trigger: int = 100) -> DataFrame:
        """The queue directory as a Structured Streaming source. Offsets are
        tracked in the query's checkpoint — commit == ack; a crashed batch
        is reprocessed (at-least-once), exactly the SQS contract."""
        return (
            spark.readStream.schema(QUEUE_MESSAGE_SCHEMA)
            .option("maxFilesPerTrigger", str(max_files_per_trigger))
            .json(str(self.path))
        )
