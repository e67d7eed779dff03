"""Query catalog + plan inspection helpers."""

from dca_manager_spark.plans.queries import QUERIES, QueryDef, get_queries, get_oracles

__all__ = ["QUERIES", "QueryDef", "get_queries", "get_oracles"]
