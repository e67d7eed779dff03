"""Self-determinism: every ordering-sensitive or hash-based catalog query
must return IDENTICAL rows when run twice in the same session — catches
nondeterminism the oracle comparison can't (both runs wrong the same way
is impossible if run-to-run output varies)."""

from __future__ import annotations

import pytest

from dca_manager_spark.plans.queries import QUERIES
from tests.conftest import SF_SMOKE

RISKY = [
    "window_rank_orders",
    "precombine_dedup_lineitem",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "similarity_lsh_ann",
    "similarity_cosine_topk",
    "dedup_cluster_canonical",
    "train_val_test_split",
    "stratified_hash_sample",
    "applyinpandas_zscore",
    "topk_global_lineitems",
]


@pytest.mark.parametrize("name", RISKY)
def test_query_self_deterministic(name, spark):
    fn = QUERIES[name].fn
    a = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    b = sorted(map(tuple, fn(spark, SF_SMOKE).collect()))
    assert a == b, f"{name} returned different rows across two runs"
