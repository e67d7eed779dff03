"""Python UDTF surface: registration, lateral-join use, deterministic
tie-breaks, edge cases."""

from __future__ import annotations

from dca_manager_spark.operators.udtf_ops import register_udtfs


def test_top_tokens_ranking_and_tiebreak(spark):
    register_udtfs(spark)
    df = spark.createDataFrame(
        [(1, "b a b a c  C b"), (2, None), (3, "   ")], ["doc_id", "text"]
    )
    df.createOrReplaceTempView("__udtf_t")
    rows = spark.sql(
        """
        SELECT d.doc_id, tt.token, tt.n, tt.rnk
        FROM __udtf_t d, LATERAL top_tokens(d.text, 2) tt
        ORDER BY d.doc_id, tt.rnk
        """
    ).collect()
    # lowercased; count desc then token asc ("a" before "c" at n=3... b=3,a=2,c=2)
    assert [(r.doc_id, r.token, r.n, r.rnk) for r in rows] == [
        (1, "b", 3, 1),
        (1, "a", 2, 2),
    ]
    # null/blank docs emit nothing (lateral join drops them)


def test_top_tokens_k_zero_emits_nothing(spark):
    register_udtfs(spark)
    spark.createDataFrame([(1, "x y z")], ["doc_id", "text"]).createOrReplaceTempView(
        "__udtf_t0"
    )
    rows = spark.sql(
        "SELECT * FROM __udtf_t0 d, LATERAL top_tokens(d.text, 0) tt"
    ).collect()
    assert rows == []


def test_cogroup_fulfillment_empty_sides(spark):
    """Left-cogroup behavior the oracle's LEFT JOIN mirrors: an order
    with no lines surfaces (0 lines, unfulfilled); lines with no order
    vanish."""
    from dca_manager_spark.operators.udtf_ops import cogroup_order_fulfillment

    orders = spark.createDataFrame(
        [(1,), (2,), (3,)], "o_orderkey long"
    )
    lines = spark.createDataFrame(
        [
            (1, 2.0, "N"), (1, 3.5, "N"),   # fulfilled
            (2, 1.0, "R"),                   # returned line -> unfulfilled
            (9, 4.0, "N"),                   # no such order -> dropped
        ],
        "l_orderkey long, l_quantity double, l_returnflag string",
    )
    rows = {
        r.o_orderkey: r
        for r in cogroup_order_fulfillment(orders, lines).collect()
    }
    assert set(rows) == {1, 2, 3}
    assert rows[1].n_lines == 2 and rows[1].sum_qty == 5.5 and rows[1].fulfilled
    assert rows[2].n_lines == 1 and not rows[2].fulfilled
    assert rows[3].n_lines == 0 and rows[3].sum_qty == 0.0 and not rows[3].fulfilled
