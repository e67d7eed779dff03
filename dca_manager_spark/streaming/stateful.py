"""Custom stateful streaming: per-transaction lifecycle tracking.

The reference's pipeline moves every order through pending (EP1 writes
status=pending + queue message) -> complete (EP2 writes status=complete)
asynchronously. This operator reconstructs that lifecycle from the event
stream with ``applyInPandasWithState`` (SURVEY §2B 'Arbitrary state' row):
state = the pending timestamp per transaction_id; when the complete event
arrives (possibly many micro-batches later) it emits one settlement row
with the pending->complete latency and clears the state.

Scale: state is one timestamp per in-flight transaction, partitioned by
the groupBy key — bounded by in-flight order count, not stream length.
Timeouts evict state for transactions that never complete (the SQS
14-day-retention analog)."""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

LIFECYCLE_OUTPUT_SCHEMA = (
    "transaction_id string, pending_ts timestamp, complete_ts timestamp, "
    "latency_s double, outcome string"
)
LIFECYCLE_STATE_SCHEMA = "pending_ts timestamp"


def track_order_lifecycle(
    events: DataFrame,
    timeout_ms: int | None = None,
) -> DataFrame:
    """events: streaming DF with (transaction_id string, status string
    in {pending, complete}, ts timestamp). Emits one row per completed
    transaction; with ``timeout_ms`` set, also emits outcome='expired'
    rows for transactions whose pending state aged out (processing-time
    timeout)."""
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_ms
        else GroupStateTimeout.NoTimeout
    )

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        txid = key[0]
        if state.hasTimedOut:
            (pending_ts,) = state.get
            state.remove()
            yield pd.DataFrame(
                {
                    "transaction_id": [txid],
                    "pending_ts": [pending_ts],
                    "complete_ts": [pd.NaT],
                    "latency_s": [None],
                    "outcome": ["expired"],
                }
            )
            return

        pending_ts = state.get[0] if state.exists else None
        out = []
        rows = pd.concat(list(pdfs), ignore_index=True).sort_values("ts")
        for row in rows.itertuples():
            if row.status == "pending" and pending_ts is None:
                ts = row.ts
                pending_ts = ts.to_pydatetime() if hasattr(ts, "to_pydatetime") else ts
            elif row.status == "complete":
                latency = (
                    (row.ts - pending_ts).total_seconds()
                    if pending_ts is not None
                    else None
                )
                out.append(
                    {
                        "transaction_id": txid,
                        "pending_ts": pending_ts,
                        "complete_ts": row.ts,
                        "latency_s": latency,
                        "outcome": "completed",
                    }
                )
                pending_ts = None
        if pending_ts is not None:
            state.update((pending_ts,))
            if timeout_ms:
                state.setTimeoutDuration(timeout_ms)
        elif state.exists:
            state.remove()
        if out:
            yield pd.DataFrame(out)

    return events.groupBy("transaction_id").applyInPandasWithState(
        fn,
        outputStructType=LIFECYCLE_OUTPUT_SCHEMA,
        stateStructType=LIFECYCLE_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
