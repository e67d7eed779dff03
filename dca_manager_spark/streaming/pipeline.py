"""The streaming variant of EP2 as one callable (SURVEY §7 step 5).

queue readStream -> Real-filter (A6) -> DISTRIBUTED per-batch connector
enrichment (mapInPandas) + partitioned complete-JSON sink + keyed MERGE
(A13/A15) — the reference's lambda+per-file-Glue topology collapsed into a
single Structured Streaming query with checkpoint-as-ack.

Scale shape: the reference enriches queue messages in a driver-side loop
(cmd/process_orders/main.go:130-279 — fine at DCA volumes, a bottleneck at
engine volumes). Here enrichment runs on EXECUTORS: the micro-batch is
mapInPandas'd through the connector (one connector instance per partition,
Arrow batches in/out — same pattern as EP1's execute_orders_distributed),
so the only driver-side collects on the hot path are bounded metadata
(distinct exchange values, O(#exchanges) not O(rows); pinned by a
no-row-collect test).

Delivery semantics: the file source is at-least-once under crash/replay;
the table write is a keyed upsert, so replays converge to the same table
state (exactly-once EFFECT on the table — the JSON side files may be
rewritten, which is how the reference behaves on SQS redelivery too).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path
from typing import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dca_manager_spark.pipeline.connectors import Orderer, get_orderers, resolve_orderer
from dca_manager_spark.pipeline.load_transactions import load_transactions
from dca_manager_spark.pipeline.process_orders import COMPLETE_PREFIX, complete_key
from dca_manager_spark.streaming.queue_source import FileQueue

# OrderComplete fields + the exchange attr (pkg/orders/common.go:39-50);
# numerics stay decimal strings at this tier (SURVEY §1.3).
ENRICHED_SCHEMA = (
    "exchange string, transaction_id string, exchange_status string, "
    "pair string, order_type string, type string, price string, fee string, "
    "volume string, open_time double, close_time double"
)


def enrich_orders_distributed(
    batch_df: DataFrame,
    data_dir: str,
    orderers: dict[str, Orderer] | None = None,
    orderer_factory: Callable[[], dict[str, Orderer]] | None = None,
) -> DataFrame:
    """EP2 enrichment on executors: each partition instantiates its
    connectors once (``orderer_factory``, or a pickled ``orderers`` dict
    for injected test doubles), calls ``process_transaction`` per message,
    writes the complete-JSON side file at the exact reference key
    (cmd/process_orders/main.go:194-227), and emits the normalized rows.

    Returns the enriched DataFrame — callers feed it (or the JSON prefix
    it wrote) to the analytics load. Empty-transaction-id rows are skipped
    (main.go:196-199)."""
    import pandas as pd

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        resolved = orderers if orderers is not None else (orderer_factory or get_orderers)()
        cols = [f.split()[0] for f in ENRICHED_SCHEMA.split(", ")]
        for pdf in batches:
            out = []
            for row in pdf.to_dict("records"):
                orderer = resolve_orderer(resolved, row["exchange"])
                for oc in orderer.process_transaction(row["transaction_id"]):
                    if not oc.transaction_id:
                        continue  # main.go:196-199
                    key = complete_key(row["exchange"], oc.transaction_id)
                    target = Path(data_dir) / key
                    target.parent.mkdir(parents=True, exist_ok=True)
                    target.write_text(json.dumps(dataclasses.asdict(oc)))
                    out.append({"exchange": row["exchange"], **dataclasses.asdict(oc)})
            yield pd.DataFrame(out, columns=cols)

    return batch_df.mapInPandas(enrich, schema=ENRICHED_SCHEMA)


def run_streaming_pipeline(
    spark: SparkSession,
    queue: FileQueue,
    data_dir: str,
    table_path: str,
    checkpoint_dir: str,
    write_operation: str = "upsert",
    orderers: dict[str, Orderer] | None = None,
    available_now: bool = True,
    dead_letter_dir: str | None = None,
) -> StreamingQuery:
    """Start (and with ``available_now`` drain) the streaming EP2. Returns
    the StreamingQuery; callers awaitTermination as needed.

    ``dead_letter_dir``: the reference silently deletes non-real messages
    (ack+skip, main.go:143-158); pass a directory to also QUARANTINE them
    as JSON for audit/replay — the engine analogue of an SQS dead-letter
    queue (the reference's queue declares none)."""

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        real = batch_df.filter(F.col("real") == "true")  # A6, main.go:143-158
        if dead_letter_dir:
            batch_df.filter(
                F.col("real").isNull() | (F.col("real") != "true")
            ).write.mode("append").json(dead_letter_dir)
        enriched = enrich_orders_distributed(real, data_dir, orderers=orderers)
        # Bounded metadata collect: distinct exchange values only —
        # O(#exchanges), never O(rows).
        exchanges = [
            r.exchange for r in enriched.select("exchange").distinct().collect()
        ]
        for exchange in sorted(exchanges):
            load_transactions(
                spark,
                input_path=str(
                    Path(data_dir) / COMPLETE_PREFIX / f"exchange={exchange.lower()}"
                ),
                table_path=table_path,
                write_operation=write_operation,
                additional_columns={"exchange": exchange},
            )

    writer = (
        queue.as_stream(spark)
        .writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
