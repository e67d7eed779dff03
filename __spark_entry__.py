"""Driver contract for the spark-graft builder (PySpark target).

Thin delegation into :mod:`dca_manager_spark.plans.queries` — the engine's
query catalog, where every entry pairs a Spark plan with a DuckDB oracle.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Import works regardless of the harness's cwd.
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from dca_manager_spark.plans.queries import get_oracles, get_queries  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the canonical scan+agg
    (pricing summary — the DCA cost-basis query shape)."""
    qs = get_queries()
    return qs["q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return get_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle for each SQL-expressible query."""
    return get_oracles()
