"""The query catalog: every operator from SURVEY §2 as a named, oracle-checked
query over the driver testdata (TESTDATA.md).

Each entry pairs a Spark plan (DataFrame API, Catalyst-optimized) with an
ANSI-SQL oracle DuckDB runs on the same parquet. The driver hash-compares
values, so every query follows a cross-engine determinism policy:

- **Sums of doubles are quantized to integer cents first**: per-row double
  arithmetic is IEEE-exact and engine-independent, and ``floor(x*100)`` is
  unambiguous on a double — unlike a double->decimal CAST, where Spark
  rounds the shortest string repr while DuckDB rounds the exact binary
  value, and they disagree near .xx5 boundaries. Summing the integer cents
  as DECIMAL is exact and ORDER-INDEPENDENT; the final /100 happens in
  double, identically on both sides.
- **Averages** are exact cent sums cast to double, then the same /100 and
  /count double divisions in both engines.
- **Every ordering has a total tie-break** (unique key last) so top-k/rank
  outputs are unique row sets.
- **No nondeterministic survivors**: `dropDuplicates` keeps an arbitrary
  row, so keyed dedup uses window `row_number`/`min` with total ordering.

Aliases match the oracle column names exactly (driver sorts columns by name
before hashing).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

def cents(col: F.Column) -> F.Column:
    """Quantize a double expression to integer cents, IEEE-exactly."""
    return F.floor(col * 100).cast("decimal(38,0)")


def dsum(col: F.Column) -> F.Column:
    """Order-independent, engine-exact sum of a double expression."""
    return F.sum(cents(col)).cast("double") / 100


def davg(col: F.Column) -> F.Column:
    """Exact cent sum -> double, /100, /count — deterministic average."""
    return F.sum(cents(col)).cast("double") / 100 / F.count(F.lit(1))


def o_dsum(expr: str) -> str:
    return f"CAST(SUM(CAST(FLOOR(({expr}) * 100) AS DECIMAL(38,0))) AS DOUBLE) / 100"


def o_davg(expr: str) -> str:
    return f"{o_dsum(expr)} / COUNT(*)"


@dataclass
class QueryDef:
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None => non-SQL-expressible; driver does rows-only check


QUERIES: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None):
    def deco(fn):
        QUERIES[name] = QueryDef(fn, oracle)
        return fn
    return deco


def get_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: qd.fn for name, qd in QUERIES.items()}


def get_oracles() -> dict[str, str]:
    return {name: qd.oracle for name, qd in QUERIES.items() if qd.oracle is not None}


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    from dca_manager_spark.io.readers import load_table

    return load_table(spark, sf_dir, name)


# ===========================================================================
# Aggregations (SURVEY §2B "Aggregations"; the DCA cost-basis family)
# ===========================================================================

@query(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {o_dsum('l_quantity')} AS sum_qty,
           {o_dsum('l_extendedprice')} AS sum_base_price,
           {o_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
           {o_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
           {o_davg('l_quantity')} AS avg_qty,
           {o_davg('l_extendedprice')} AS avg_price,
           {o_davg('l_discount')} AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-02'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape — partial+final hash aggregate; the canonical scan+agg.

    Scale: predicate + the 7-column projection push into the parquet scan;
    partial aggregation makes the shuffle carry only (6 groups x partials).
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2001-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@query(
    "agg_distinct_per_segment",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_distinct_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregate (expand + two-phase agg under the hood)."""
    return (
        t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


# ===========================================================================
# Joins (SURVEY §2B "Joins")
# ===========================================================================

@query(
    "q3_shipping_priority",
    f"""
    SELECT l.l_orderkey,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter -> join -> agg -> top-k.

    Scale: the filtered customer side is small => AQE turns it into a
    broadcast join; limit compiles to TakeOrderedAndProject (no full sort).
    """
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


@query(
    "q5_local_supplier_volume",
    f"""
    SELECT n.n_name,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name = 'ASIA'
      AND o.o_orderdate >= TIMESTAMP '1996-01-01'
      AND o.o_orderdate <  TIMESTAMP '1997-01-01'
    GROUP BY n.n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join with two broadcastable dims.

    Scale: region/nation/supplier are classic broadcast dims; the only big
    shuffle is lineitem ⋈ orders on orderkey. Catalyst reorders the rest.
    """
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    l = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    r = t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


@query(
    "q10_returned_items",
    f"""
    SELECT c.c_custkey, c.c_name,
           {o_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
           n.n_name
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: fact-fact join + broadcast dim + grouped top-k."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    l = t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    n = t(spark, sf_dir, "nation")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"))
        .select("c_custkey", "c_name", "revenue", "n_name")
        .orderBy(F.col("revenue").desc(), F.col("c_custkey"))
        .limit(20)
    )


@query(
    "join_left_semi",
    """
    SELECT c_mktsegment, COUNT(*) AS n_customers_with_orders
    FROM customer
    WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
    GROUP BY c_mktsegment
    """,
)
def join_left_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS/IN rewrite)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_customers_with_orders"))
    )


@query(
    "join_left_anti",
    """
    SELECT c.c_custkey, c.c_name
    FROM customer c
    WHERE c.c_custkey NOT IN
          (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
    ORDER BY c.c_custkey
    """,
)
def join_left_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT IN / NOT EXISTS rewrite): customers with no
    urgent orders — a non-empty result at every SF."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


@query(
    "join_broadcast_dim",
    f"""
    SELECT p.p_type,
           {o_dsum('l.l_quantity')} AS total_qty,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_size < 10
    GROUP BY p.p_type
    ORDER BY p_type
    """,
)
def join_broadcast_dim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast-hash join on a filtered dim (SURVEY A9 analog:
    tiny lookup side must never shuffle the fact table)."""
    l = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part").filter(F.col("p_size") < 10)
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .groupBy("p_type")
        .agg(dsum(F.col("l_quantity")).alias("total_qty"), F.count(F.lit(1)).alias("n_lines"))
        .orderBy("p_type")
    )


@query(
    "join_full_outer",
    """
    SELECT COALESCE(cn.c_nationkey, sn.s_nationkey) AS nationkey,
           COALESCE(cn.n_cust, 0) AS n_cust,
           COALESCE(sn.n_supp, 0) AS n_supp
    FROM (SELECT c_nationkey, COUNT(*) AS n_cust FROM customer GROUP BY c_nationkey) cn
    FULL OUTER JOIN (SELECT s_nationkey, COUNT(*) AS n_supp FROM supplier GROUP BY s_nationkey) sn
      ON cn.c_nationkey = sn.s_nationkey
    ORDER BY nationkey
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-outer equi join of two aggregates."""
    cn = (
        t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    sn = (
        t(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    joined = cn.join(sn, cn.c_nationkey == sn.s_nationkey, "full_outer")
    return joined.select(
        F.coalesce(cn.c_nationkey, sn.s_nationkey).alias("nationkey"),
        F.coalesce(cn.n_cust, F.lit(0)).alias("n_cust"),
        F.coalesce(sn.n_supp, F.lit(0)).alias("n_supp"),
    ).orderBy("nationkey")


# ===========================================================================
# Window functions (SURVEY §2B "Window functions")
# ===========================================================================

@query(
    "window_rank_orders",
    """
    SELECT o_custkey, o_orderkey, o_totalprice, rnk
    FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               RANK() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rnk
        FROM orders
    )
    WHERE rnk <= 3
    ORDER BY o_custkey, rnk, o_orderkey
    """,
)
def window_rank_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-N per key via rank (total order => deterministic)."""
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey")
    )
    return (
        t(spark, sf_dir, "orders")
        .withColumn("rnk", F.rank().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rnk")
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


@query(
    "window_running_invested",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(FLOOR(o_totalprice * 100) AS DECIMAL(38,0)))
                OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) / 100 AS running_spend
    FROM orders
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def window_running_invested(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total per key — the DCA 'cumulative invested' query shape
    (SURVEY §2B window table). Decimal accumulation keeps prefix sums exact.
    """
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        t(spark, sf_dir, "orders")
        .withColumn(
            "running_spend",
            F.sum(cents(F.col("o_totalprice"))).over(w).cast("double") / 100,
        )
        .select("o_custkey", "o_orderkey", "o_orderdate", "running_spend")
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


@query(
    "window_lag_lead",
    """
    SELECT user_id, event_id, ts, value,
           LAG(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value,
           LEAD(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_value
    FROM events
    WHERE event_type = 'purchase'
    ORDER BY user_id, ts, event_id
    """,
)
def window_lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead analytics over an event stream."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            "event_id",
            "ts",
            "value",
            F.lag("value").over(w).alias("prev_value"),
            F.lead("value").over(w).alias("next_value"),
        )
        .orderBy("user_id", "ts", "event_id")
    )


# ===========================================================================
# Sorts / limits / top-k
# ===========================================================================

@query(
    "topk_global_lineitems",
    """
    SELECT l_orderkey, l_linenumber, l_extendedprice
    FROM lineitem
    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
    LIMIT 15
    """,
)
def topk_global_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k => TakeOrderedAndProject (heap per partition, no full
    sort shuffle — the only top-k shape that survives 100 TB)."""
    from dca_manager_spark.operators.relational import top_k

    li = t(spark, sf_dir, "lineitem").select("l_orderkey", "l_linenumber", "l_extendedprice")
    return top_k(
        li, 15, F.col("l_extendedprice").desc(), F.col("l_orderkey"), F.col("l_linenumber")
    )
