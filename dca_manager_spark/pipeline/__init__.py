"""Pipeline layer: the reference's three entry points as composable Spark
jobs (SURVEY §3) — execute-orders, process-orders, load-transactions —
with connectors as plugins and a deterministic fake (pkg/orders/fake.go
parity)."""

from dca_manager_spark.pipeline.connectors import FakeOrderer, Orderer, get_orderers
from dca_manager_spark.pipeline.execute_orders import execute_orders
from dca_manager_spark.pipeline.load_transactions import load_transactions
from dca_manager_spark.pipeline.process_orders import process_orders

__all__ = [
    "FakeOrderer",
    "Orderer",
    "get_orderers",
    "execute_orders",
    "process_orders",
    "load_transactions",
]
