"""transformWithStateInPandas twin of streaming/stateful.py — CONTRIB.

Spark 4's ``transformWithStateInPandas`` (StatefulProcessor + typed
ValueState) is the successor to ``applyInPandasWithState``: named
state variables, explicit init/close lifecycle, per-state TTL instead
of one group timeout. Its runtime needs ``google.protobuf`` (the
state-server protocol) and the RocksDB state-store provider — this
sandbox has no protobuf and no network to install one, so the engine
path here has NEVER executed end-to-end (13 rounds of pytest skips).
Per the honesty contract the twin lives in contrib/: the processor's
pure per-group logic stays unit-tested
(tests/test_streaming.py::test_lifecycle_processor_logic_without_engine),
but the engine wrapper is OUT of the supported surface and COVERAGE.md
does not count it. ``streaming/stateful.track_order_lifecycle``
(applyInPandasWithState) is the verified arbitrary-state operator.

To promote back: install protobuf, set
``spark.sql.streaming.stateStore.providerClass`` to the RocksDB
provider, run the lifecycle parity test preserved in this module's
docstring history (git: tests/test_streaming.py @ r13), and move the
code back into streaming/stateful.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dca_manager_spark.streaming.stateful import LIFECYCLE_OUTPUT_SCHEMA


class OrderLifecycleProcessor:
    """The lifecycle operator's per-group logic on the
    StatefulProcessor protocol. Semantics match
    ``streaming.stateful.track_order_lifecycle`` (minus timeout-expiry
    rows, which TTL silently evicts rather than emitting); the pure
    logic is pinned by the fake-state unit test."""

    def init(self, handle) -> None:
        self._pending = handle.getValueState("pending_ts", "pending_ts timestamp")

    def handleInputRows(self, key, rows, timer_values):
        import pandas as pd

        txid = key[0]
        pending = self._pending.get()
        pending_ts = pending[0] if pending is not None else None
        out = []
        batch = pd.concat(list(rows), ignore_index=True).sort_values("ts")
        for row in batch.itertuples():
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
            self._pending.update((pending_ts,))
        else:
            self._pending.clear()
        if out:
            yield pd.DataFrame(out)

    def handleExpiredTimer(self, key, timer_values, expired_timer_info):
        return iter(())

    def handleInitialState(self, key, initial_state, timer_values) -> None:
        pass

    def close(self) -> None:
        pass


def track_order_lifecycle_tws(events: DataFrame) -> DataFrame:
    """``track_order_lifecycle`` on the transformWithStateInPandas API.

    Requires the RocksDB state store provider (the API rejects the
    default HDFS-backed store); callers set
    ``spark.sql.streaming.stateStore.providerClass`` to
    ``org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider``.
    Also requires ``google.protobuf`` (Spark's state-server protocol for
    this API) — absent in this environment, hence contrib status and
    the loud import gate.
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "transformWithStateInPandas needs the protobuf package "
            "(pyspark's state-server protocol); use "
            "streaming.stateful.track_order_lifecycle "
            "(applyInPandasWithState) instead"
        ) from exc
    from pyspark.sql.streaming.stateful_processor import StatefulProcessor

    # Subclass dynamically so the module imports even if the API moves.
    proc = type(
        "_Proc", (StatefulProcessor,), dict(OrderLifecycleProcessor.__dict__)
    )()
    return events.groupBy("transaction_id").transformWithStateInPandas(
        statefulProcessor=proc,
        outputStructType=LIFECYCLE_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
