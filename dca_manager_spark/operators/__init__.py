"""Operator layer: relational extensions + training-data-pipeline operators."""

from dca_manager_spark.operators.relational import asof_join, range_join, top_k

__all__ = ["asof_join", "range_join", "top_k"]
