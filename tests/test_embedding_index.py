"""EmbeddingIndex: the persisted-index steady-state loop for vectors."""

from __future__ import annotations

import json

import numpy as np
import pytest

from dca_manager_spark.operators.embedding_index import (
    EMBEDDING_LSH_FAMILY,
    EmbeddingIndex,
    build_embedding_index,
    embedding_incremental_filter,
)


def _vecs(spark, rows):
    return spark.createDataFrame(rows, "vid long, embedding array<float>")


@pytest.fixture()
def base_vectors():
    rng = np.random.default_rng(23)
    return rng.normal(size=(8, 16)).astype("float32")


def test_incremental_filter_admits_novel_rejects_dup(spark, base_vectors):
    corpus = _vecs(spark, [(i, base_vectors[i].tolist()) for i in range(6)])
    idx = build_embedding_index(corpus, "vid", "embedding")
    rng = np.random.default_rng(5)
    novel = rng.normal(size=16).astype("float32")
    batch = _vecs(
        spark,
        [(100, base_vectors[2].tolist()),   # exact dup of corpus vec 2
         (101, novel.tolist())],            # novel
    )
    admitted = embedding_incremental_filter(
        batch, "vid", "embedding", idx, threshold=0.9
    )
    assert {r.vid for r in admitted.collect()} == {101}


def test_persisted_loop_suppresses_across_batches(spark, base_vectors, tmp_path):
    """The full steady-state loop across PROCESS boundaries: build ->
    save -> (load -> filter -> append) x 2; batch 2's duplicate of batch
    1's admission is suppressed by the GROWN on-disk index."""
    path = str(tmp_path / "eidx")
    corpus = _vecs(spark, [(i, base_vectors[i].tolist()) for i in range(6)])
    build_embedding_index(corpus, "vid", "embedding").save(path)

    rng = np.random.default_rng(9)
    novel = rng.normal(size=16).astype("float32")
    b1 = _vecs(spark, [(100, novel.tolist())])
    idx = EmbeddingIndex.load(spark, path)
    a1 = embedding_incremental_filter(b1, "vid", "embedding", idx, threshold=0.9)
    assert {r.vid for r in a1.collect()} == {100}
    EmbeddingIndex.append(spark, path, a1, "vid", "embedding")

    b2 = _vecs(
        spark,
        [(200, novel.tolist()),                       # dup of batch-1 admission
         (201, base_vectors[0].tolist()),             # dup of original corpus
         (202, rng.normal(size=16).astype("float32").tolist())],
    )
    idx2 = EmbeddingIndex.load(spark, path)
    a2 = embedding_incremental_filter(b2, "vid", "embedding", idx2, threshold=0.9)
    assert {r.vid for r in a2.collect()} == {202}


def test_extend_in_memory_matches_append(spark, base_vectors):
    corpus = _vecs(spark, [(i, base_vectors[i].tolist()) for i in range(4)])
    idx = build_embedding_index(corpus, "vid", "embedding")
    batch = _vecs(spark, [(50, base_vectors[7].tolist())])
    grown = idx.extend(batch, "vid", "embedding")
    dup = _vecs(spark, [(60, base_vectors[7].tolist())])
    out = embedding_incremental_filter(dup, "vid", "embedding", grown, threshold=0.9)
    assert out.count() == 0


def test_family_mismatch_is_loud_everywhere(spark, base_vectors, tmp_path):
    path = str(tmp_path / "eidx")
    corpus = _vecs(spark, [(0, base_vectors[0].tolist())])
    idx = build_embedding_index(corpus, "vid", "embedding")
    idx.save(path)
    p = f"{path}/index_params.json"
    doc = json.load(open(p))
    doc["family"] = "xxh64-planes-v0"
    json.dump(doc, open(p, "w"))
    with pytest.raises(ValueError, match="plane family"):
        EmbeddingIndex.load(spark, path)
    with pytest.raises(ValueError, match="plane family"):
        EmbeddingIndex.append(spark, path, corpus, "vid", "embedding")
    stale = EmbeddingIndex(idx.sigs, idx.vecs, doc)
    with pytest.raises(ValueError, match="plane family"):
        embedding_incremental_filter(corpus, "vid", "embedding", stale)
    with pytest.raises(ValueError, match="plane family"):
        stale.extend(corpus, "vid", "embedding")
