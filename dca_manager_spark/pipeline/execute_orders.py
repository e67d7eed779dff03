"""EP1: scheduled order execution (cmd/execute_orders/main.go:120-214).

config scan -> enabled filter -> per-order connector call -> partitioned
JSON sink (pending) + queue publish.

The connector call is an external-API boundary, so the fan-out is a
driver-side loop over the (tiny) config — exactly the reference's shape
(main.go:143-211). Config frames are KB-sized; collecting them is O(orders),
not O(data). The DATA path (everything downstream of the raw JSON) is fully
distributed.
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Any

from pyspark.sql import SparkSession

from dca_manager_spark.io.readers import read_dca_config, validate_dca_config
from dca_manager_spark.pipeline.connectors import Orderer, get_orderers, resolve_orderer
from dca_manager_spark.streaming.queue_source import FileQueue

PENDING_PREFIX = "transactions/status=pending"  # aws_lambda_execute_orders.tf:6

FULFILLED_SCHEMA = (
    "exchange string, transaction_id string, timestamp long, result_json string"
)


def execute_orders_distributed(
    spark: SparkSession,
    config_path: str,
    allow_real: bool = False,
):
    """A8's scale path: dispatch connector calls from EXECUTORS via
    mapInPandas — for configs with thousands of orders, the driver loop in
    ``execute_orders`` serializes on API latency; here each partition runs
    its orders concurrently (one connector instance per partition, Arrow
    batches in/out). Returns a DataFrame of fulfilled orders; callers sink
    it with ``write_partitioned_json`` + publish from ``foreachPartition``.

    The deterministic fake connector is used unless ``allow_real`` — and a
    real deployment injects a picklable connector factory the same way.
    """
    import json as _json
    from typing import Iterator

    import pandas as pd

    from dca_manager_spark.io.readers import read_dca_config, validate_dca_config
    from dca_manager_spark.pipeline.connectors import get_orderers, resolve_orderer

    problems = validate_dca_config(config_path)
    if problems:
        raise ValueError(f"invalid DCA config: {problems}")
    config = read_dca_config(spark, config_path).filter("enabled OR enabled IS NULL")

    def dispatch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        orderers = get_orderers(allow_real=allow_real)  # one per partition
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                orderer = resolve_orderer(orderers, row["exchange"])
                fulfilled = orderer.make_order(row)
                out.append(
                    {
                        "exchange": row["exchange"],
                        "transaction_id": fulfilled.transaction_id,
                        "timestamp": fulfilled.timestamp,
                        "result_json": _json.dumps(fulfilled.result),
                    }
                )
            yield pd.DataFrame(out, columns=["exchange", "transaction_id", "timestamp", "result_json"])

    return config.repartition(max(spark.sparkContext.defaultParallelism, 1)).mapInPandas(
        dispatch, schema=FULFILLED_SCHEMA
    )


def sink_pending_distributed(
    fulfilled: DataFrame,
    data_dir: str,
    queue_dir: str,
    real: bool = False,
) -> int:
    """Executor-side sink for ``execute_orders_distributed`` output: each
    partition writes its pending-JSON side files at the exact reference
    keys (A10) and publishes the queue envelopes (A11) — no fulfilled row
    ever returns to the driver. Returns the number of orders sunk (from a
    count over the same frame, O(1) result).

    The queue publish is atomic per message (FileQueue tmp+rename), so a
    partially-failed task retry re-publishes only its own rows — the
    at-least-once contract EP2's keyed upsert already absorbs. The input
    is pinned (localCheckpoint) BEFORE sinking: the connector stage has
    external side effects, so it must evaluate exactly once across the
    sink and the count.
    """

    def sink(rows) -> None:
        from dca_manager_spark.streaming.queue_source import FileQueue

        queue = FileQueue(queue_dir)
        for row in rows:
            key = pending_key(row["exchange"], row["transaction_id"])
            target = Path(data_dir) / key
            target.parent.mkdir(parents=True, exist_ok=True)
            target.write_text(
                json.dumps(
                    {
                        "transaction_id": row["transaction_id"],
                        "timestamp": row["timestamp"],
                        "result": _json_loads_safe(row["result_json"]),
                    }
                )
            )
            queue.publish(
                transaction_id=row["transaction_id"],
                s3_bucket=data_dir,
                s3_key=key,
                exchange=row["exchange"],
                real=real,
            )

    pinned = fulfilled.localCheckpoint(eager=True)  # evaluate ONCE
    pinned.foreachPartition(sink)
    return pinned.count()


def _json_loads_safe(payload: str | None):
    try:
        return json.loads(payload) if payload else None
    except ValueError:
        return payload


def pending_key(exchange: str, transaction_id: str) -> str:
    """Exact S3-key layout parity (cmd/execute_orders/main.go:171-176):
    ``transactions/status=pending/exchange=<lower(exchange)>/<txid>.json``.
    The Go test pins this literal path (main_test.go:197-230)."""
    return f"{PENDING_PREFIX}/exchange={exchange.lower()}/{transaction_id}.json"


def execute_orders(
    spark: SparkSession,
    config_path: str,
    data_dir: str,
    queue: FileQueue,
    allow_real: bool = False,
    real: bool = False,
    orderers: dict[str, Orderer] | None = None,
) -> list[str]:
    """Run the execute-orders job; returns the written pending-file paths.

    - config fetched + validated (dca.go:49-73 / schema.json)
    - disabled orders skipped (kraken.go:42-45)
    - real-vs-fake branch on allow_real (main.go:156-165, DCA_ALLOW_REAL)
    - result JSON at the exact partitioned key (main.go:171-196)
    - queue publish with Exchange/TransactionId/Real attrs (main.go:198-208)
    """
    problems = validate_dca_config(config_path)
    if problems:
        raise ValueError(f"invalid DCA config: {problems}")

    config = read_dca_config(spark, config_path)
    enabled = [r.asDict() for r in config.filter("enabled OR enabled IS NULL").collect()]

    orderers = orderers or get_orderers(allow_real=allow_real)
    written: list[str] = []
    for order in enabled:
        orderer = resolve_orderer(orderers, order["exchange"])
        fulfilled = orderer.make_order(order)

        key = pending_key(order["exchange"], fulfilled.transaction_id)
        target = Path(data_dir) / key
        target.parent.mkdir(parents=True, exist_ok=True)
        target.write_text(json.dumps(dataclasses.asdict(fulfilled)))
        written.append(str(target))

        queue.publish(
            transaction_id=fulfilled.transaction_id,
            s3_bucket=data_dir,
            s3_key=key,
            exchange=order["exchange"],
            real=real,
        )
    return written
