"""Plan inspection helpers: assert the physical plan the optimizer picked
is the plan a 100 TB deployment needs (pushdown, broadcast, no driver
collects). Used by tests/test_plans.py and by developers via
``explain_formatted``."""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_formatted(df: DataFrame) -> str:
    """The formatted explain output as a string (df.explain prints only)."""
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), "formatted"
    )


def physical_plan(df: DataFrame) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def has_pushed_filter(df: DataFrame, fragment: str) -> bool:
    """True if the parquet scan carries a pushed filter mentioning
    ``fragment`` (PushedFilters: [...])."""
    text = explain_formatted(df)
    return any(
        "PushedFilters" in line and fragment in line and "[]" not in line.split("PushedFilters")[1][:4]
        for line in text.splitlines()
    )


def read_schema_columns(df: DataFrame, table_fragment: str = "") -> list[str]:
    """Columns the parquet scan actually reads (ReadSchema) — column
    pruning evidence."""
    import re

    text = explain_formatted(df)
    cols: list[str] = []
    for line in text.splitlines():
        if "ReadSchema" in line and (not table_fragment or table_fragment in text):
            cols.extend(re.findall(r"(\w+):", line.split("ReadSchema")[1]))
    return cols


def uses(df: DataFrame, node_fragment: str) -> bool:
    """True if the executed plan contains the node (e.g.
    'BroadcastHashJoin', 'SortMergeJoin', 'TakeOrderedAndProject')."""
    return node_fragment in explain_formatted(df)


def unpartitioned_window_count(df: DataFrame) -> int:
    """Number of Window nodes in the optimized logical plan with an EMPTY
    partitionSpec. Such a window forces Exchange SinglePartition — every
    row through ONE task — which is a 100 TB scale-killer unless the
    input is provably bounded (e.g. sits above a small limit/aggregate).
    Walked on the logical plan because the physical rendering of the
    exchange varies with AQE/limit placement."""
    count = 0
    stack = [df._jdf.queryExecution().optimizedPlan()]
    while stack:
        node = stack.pop()
        if node.nodeName() == "Window" and node.partitionSpec().isEmpty():
            count += 1
        children = node.children()
        for i in range(children.length()):
            stack.append(children.apply(i))
    return count
