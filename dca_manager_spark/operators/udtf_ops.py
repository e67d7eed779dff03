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
