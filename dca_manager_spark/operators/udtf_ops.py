"""Python UDTFs (Spark 4 table functions) — the engine's UDTF surface.

The reference has no UDTF-shaped logic (SURVEY §2B: "No UDTF exists in
the reference"); the engine exposes the real Spark 4 ``@udtf`` API so
analytics users can write one, with a worked, oracle-checked example.

UDTFs are the SLOW path — row-at-a-time Python, one process round-trip
per row (enable ``spark.sql.execution.pythonUDTF.arrow.enabled`` where
the session allows for Arrow batching). Every transformation here that
CAN be a built-in already exists as one (top tokens = explode + window
in ``vocabulary_oov`` style plans); the UDTF exists for logic that
genuinely needs imperative Python per input row. Keep inputs bounded.
"""

from __future__ import annotations

import re
from collections import Counter

from pyspark.sql import functions as F
from pyspark.sql.functions import udtf


@udtf(returnType="token string, n bigint, rnk int")
class TopTokensUDTF:
    """Emit the top-k most frequent whitespace tokens of ``text`` with a
    total-order tie-break (count desc, token asc) — deterministic, so a
    SQL oracle (explode + count + row_number) replicates it exactly.
    Tokenization matches ``operators/text.tokens``: trim, lowercase,
    split on whitespace runs, drop empties."""

    def eval(self, text: str, k: int):
        toks = [t for t in re.split(r"\s+", (text or "").strip().lower()) if t]
        ranked = sorted(Counter(toks).items(), key=lambda kv: (-kv[1], kv[0]))
        for i, (tok, n) in enumerate(ranked[: max(k, 0)], 1):
            yield tok, n, i


def register_udtfs(spark) -> None:
    """Register the UDTF surface on a session (idempotent)."""
    spark.udtf.register("top_tokens", TopTokensUDTF)


def cogroup_order_fulfillment(orders: "DataFrame", lineitem: "DataFrame"):
    """Per-order reconciliation via COGROUPED applyInPandas (the last
    pandas-API surface: groupBy().cogroup().applyInPandas) — each order
    key's rows from BOTH tables arrive as two aligned pandas frames.

    Semantics (deliberately SQL-expressible so the catalog oracle can
    verify the cogroup machinery end-to-end): per order, the line count,
    cent-exact quantity sum, and a fulfilled flag (every line shipped,
    i.e. no line with returnflag 'R'). Orders with no lines surface with
    zero lines — the left-cogroup behavior a plain inner join loses.

    Scale: cogroup shuffles BOTH sides once on the key (same exchange an
    equi join needs) and streams each key's Arrow batches through
    Python. This is the SLOW path — use it when per-key logic genuinely
    needs imperative pandas (sessionized reconciliation, model scoring
    over a key's history); this aggregate exists as the verifiable
    stand-in. At 100 TB the shape holds: work is per-key, no collect,
    skew governed by the largest single key."""
    import pandas as pd

    def fulfill(key, odf: "pd.DataFrame", ldf: "pd.DataFrame") -> "pd.DataFrame":
        if not len(odf):
            # lines for an unknown order: nothing to report on
            return pd.DataFrame(
                columns=["o_orderkey", "n_lines", "sum_qty", "fulfilled"]
            )
        import numpy as np

        qty_cents = (
            int(np.floor(ldf["l_quantity"].to_numpy() * 100).sum())
            if len(ldf)
            else 0
        )
        return pd.DataFrame(
            {
                "o_orderkey": [key[0]],
                "n_lines": [len(ldf)],
                "sum_qty": [qty_cents / 100.0],
                "fulfilled": [
                    bool(len(ldf)) and not (ldf["l_returnflag"] == "R").any()
                ],
            }
        )

    return (
        orders.select("o_orderkey")
        .groupBy("o_orderkey")
        .cogroup(
            lineitem.select(
                F.col("l_orderkey").alias("o_orderkey"),
                "l_quantity",
                "l_returnflag",
            ).groupBy("o_orderkey")
        )
        .applyInPandas(
            fulfill,
            schema="o_orderkey long, n_lines long, sum_qty double, fulfilled boolean",
        )
    )


def arrow_flag_stats(lineitem: "DataFrame"):
    """Per-returnflag stats via grouped applyInArrow (Spark 4) — the
    Arrow-native grouped-map: each key's rows arrive as ONE
    pyarrow.Table (no pandas boxing), the kernel runs numpy over the
    Arrow buffers, and one Table row goes back.

    Semantics are deliberately SQL-expressible (count + cent-exact
    quantity sum + max extended price) so the oracle verifies the
    applyInArrow machinery — grouping, whole-key Table assembly, Arrow
    round-trip — end-to-end. Same caveat as every grouped-map: the
    WHOLE key materializes per Python call, so keys must be bounded or
    pre-aggregated; the built-in groupBy in the oracle is the fast
    path, this is the escape hatch for per-key kernels JVM expressions
    can't write."""
    import numpy as np
    import pyarrow as pa

    def stats(table: "pa.Table") -> "pa.Table":
        qty = np.asarray(table.column("l_quantity").to_numpy(zero_copy_only=False),
                         dtype=np.float64)
        price = np.asarray(
            table.column("l_extendedprice").to_numpy(zero_copy_only=False),
            dtype=np.float64,
        )
        flag = table.column("l_returnflag")[0].as_py()
        cents = int(np.floor(qty * 100).sum())
        return pa.Table.from_arrays(
            [
                pa.array([flag], type=pa.string()),
                pa.array([len(qty)], type=pa.int64()),
                pa.array([cents / 100.0], type=pa.float64()),
                pa.array([float(price.max())], type=pa.float64()),
            ],
            names=["l_returnflag", "n_lines", "sum_qty", "max_price"],
        )

    return lineitem.groupBy("l_returnflag").applyInArrow(
        stats,
        schema="l_returnflag string, n_lines long, sum_qty double, max_price double",
    )
