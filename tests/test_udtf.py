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
