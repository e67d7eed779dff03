"""PageRank: exact fixed-point recurrence, dangling leak, iteration."""

from __future__ import annotations

import pytest

from dca_manager_spark.operators.graph import PAGERANK_Q, pagerank


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_pagerank_one_iteration_hand_computed(spark):
    # 1 -> 2, 1 -> 3, 2 -> 1; node 3 dangling (mass leaks, documented)
    e = _edges(spark, [(1, 2), (1, 3), (2, 1)])
    got = {r.node_id: r.rank_q for r in pagerank(e, "src", "dst", iters=1).collect()}
    # R0 = 10^12 div 3 = 333333333333 each; deg(1)=2, deg(2)=1
    # S(1) = 333333333333; S(2) = S(3) = 166666666666
    # base = (0.15 * 10^12) div 3 = 50000000000
    # R1(1) = 5e10 + (17*333333333333) div 20 = 333333333333
    # R1(2) = R1(3) = 5e10 + (17*166666666666) div 20 = 191666666666
    assert got == {1: 333333333333, 2: 191666666666, 3: 191666666666}


def test_pagerank_sink_accumulates_over_iterations(spark):
    # chain 1 -> 2 -> 3: rank drains toward the sink
    e = _edges(spark, [(1, 2), (2, 3)])
    r3 = {r.node_id: r.rank_q for r in pagerank(e, "src", "dst", iters=3).collect()}
    assert r3[3] > r3[2] > r3[1]
    # the source never receives: exactly the teleport share each round
    assert r3[1] == (3 * PAGERANK_Q // 20) // 3


def test_pagerank_symmetric_cycle_is_uniform_fixed_point(spark):
    # 2-cycle: uniform ranks are the exact fixed point of the integer
    # recurrence; iterating must not drift
    e = _edges(spark, [(1, 2), (2, 1)])
    for iters in (1, 4):
        got = {r.node_id: r.rank_q for r in pagerank(e, "src", "dst", iters=iters).collect()}
        assert got[1] == got[2]
        # base + d * (Q div 2) = 75e9 + (17 * 5e11) div 20 = 5e11
        assert got[1] == PAGERANK_Q // 2


def test_pagerank_parallel_edges_contribute_twice(spark):
    e = _edges(spark, [(1, 2), (1, 2), (1, 3)])  # deg(1)=3, 2 gets 2 shares
    got = {r.node_id: r.rank_q for r in pagerank(e, "src", "dst", iters=1).collect()}
    share = (PAGERANK_Q // 3) // 3
    base = (3 * PAGERANK_Q // 20) // 3
    assert got[2] == base + (17 * 2 * share) // 20
    assert got[3] == base + (17 * share) // 20


def test_pagerank_rank_presentation_and_validation(spark):
    e = _edges(spark, [(1, 2)])
    rows = pagerank(e, "src", "dst", iters=1).collect()
    for r in rows:
        assert r.rank == r.rank_q / PAGERANK_Q
    with pytest.raises(ValueError, match="iters"):
        pagerank(e, "src", "dst", iters=0)
