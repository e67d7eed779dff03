"""The streaming variant of EP2 as one callable (SURVEY §7 step 5).

queue readStream -> Real-filter (A6) -> per-batch connector enrichment +
partitioned complete-JSON sink + keyed MERGE (A13/A15) — the reference's
lambda+per-file-Glue topology collapsed into a single Structured Streaming
query with checkpoint-as-ack.

Delivery semantics: the file source is at-least-once under crash/replay;
the table write is a keyed upsert, so replays converge to the same table
state (exactly-once EFFECT on the table — the JSON side files may be
rewritten, which is how the reference behaves on SQS redelivery too).
"""

from __future__ import annotations

import dataclasses
import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from dca_manager_spark.pipeline.connectors import Orderer, get_orderers, resolve_orderer
from dca_manager_spark.pipeline.load_transactions import load_transactions
from dca_manager_spark.pipeline.process_orders import COMPLETE_PREFIX, complete_key
from dca_manager_spark.streaming.queue_source import FileQueue


def run_streaming_pipeline(
    spark: SparkSession,
    queue: FileQueue,
    data_dir: str,
    table_path: str,
    checkpoint_dir: str,
    write_operation: str = "upsert",
    orderers: dict[str, Orderer] | None = None,
    available_now: bool = True,
) -> StreamingQuery:
    """Start (and with ``available_now`` drain) the streaming EP2. Returns
    the StreamingQuery; callers awaitTermination as needed."""
    resolved = orderers or get_orderers()

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        rows = batch_df.filter(F.col("real") == "true").collect()
        loads: dict[str, bool] = {}
        for msg in rows:
            orderer = resolve_orderer(resolved, msg.exchange)
            for row in orderer.process_transaction(msg.transaction_id):
                if not row.transaction_id:
                    continue
                key = complete_key(msg.exchange, row.transaction_id)
                target = Path(data_dir) / key
                target.parent.mkdir(parents=True, exist_ok=True)
                target.write_text(json.dumps(dataclasses.asdict(row)))
                loads[msg.exchange] = True
        for exchange in loads:
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
