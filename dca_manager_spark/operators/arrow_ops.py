"""Arrow-native batch operators (``DataFrame.mapInArrow``).

``mapInArrow`` is the lowest-overhead Python escape hatch: the executor
hands the worker raw ``pyarrow.RecordBatch``es — no pandas materialization,
no per-column Series boxing — and takes RecordBatches back. It is the right
tool when the per-batch kernel is already columnar (numpy over Arrow
buffers) and the pandas layer would only add copies. This module provides
the int8-quantization profile kernel as the API's exercised surface; the
JVM-expression implementation in operators/similarity.py stays the default
(it needs no Python workers at all) — the Arrow twin exists for kernels
that outgrow JVM expressions, and is held to the SAME oracle bit-for-bit.

Determinism: every floating-point step mirrors the JVM path's op order
(float32 -> float64 widen, scale = max|x|, q = floor(x/scale*127 + 0.5),
deq = q*scale/127, err = max|x - deq|) — numpy and the JVM both execute
IEEE-754 binary64 ops, so the outputs are identical, which the shared
oracle and a twin-equality test both pin.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame


QUANT_PROFILE_SCHEMA = "vec_id long, q_scale double, q_sum long, max_err double"


def _quant_profile_batches(batches: Iterator["pa.RecordBatch"]) -> Iterator["pa.RecordBatch"]:
    import numpy as np
    import pyarrow as pa

    for batch in batches:
        ids = batch.column("vec_id")
        emb = batch.column("embedding")
        # list<float> -> (flat float64 values, row offsets); zero-copy off
        # the Arrow buffers until the float64 widen.
        flat = np.asarray(emb.values.to_numpy(zero_copy_only=False), dtype=np.float64)
        offsets = np.asarray(emb.offsets.to_numpy(zero_copy_only=False), dtype=np.int64)
        n = len(ids)
        scales = np.zeros(n)
        q_sums = np.zeros(n, dtype=np.int64)
        max_errs = np.zeros(n)
        for i in range(n):
            v = flat[offsets[i] : offsets[i + 1]]
            if v.size == 0:
                continue
            scale = np.abs(v).max()
            if scale > 0:
                q = np.floor(v / scale * 127 + 0.5)
            else:
                q = np.zeros_like(v)
            deq = q * scale / 127.0
            scales[i] = scale
            q_sums[i] = int(q.sum())
            max_errs[i] = np.abs(v - deq).max()
        yield pa.RecordBatch.from_arrays(
            [
                ids,
                pa.array(scales, type=pa.float64()),
                pa.array(q_sums, type=pa.int64()),
                pa.array(max_errs, type=pa.float64()),
            ],
            names=["vec_id", "q_scale", "q_sum", "max_err"],
        )


def quantize_profile_arrow(emb: DataFrame) -> DataFrame:
    """Per-vector int8-quantization profile (scale, code checksum, max
    reconstruction error) computed in an Arrow-native kernel.

    Input needs ``vec_id`` and ``embedding: array<float>`` columns; output
    is one row per vector. Column pruning still applies (select only the
    two needed columns BEFORE the mapInArrow boundary — Python barriers
    block pushdown through them), and the kernel is embarrassingly
    parallel per batch: no shuffle, no state, linear scan. The per-row
    Python loop touches only offsets (the arithmetic is numpy-vectorized
    per vector); for very short vectors a fully flat segmented-reduce
    formulation would amortize further, at the cost of matching the JVM
    op order less obviously.
    """
    pruned = emb.select("vec_id", "embedding")
    return pruned.mapInArrow(_quant_profile_batches, schema=QUANT_PROFILE_SCHEMA)
