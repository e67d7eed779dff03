"""Unigram-LM subword tokenizer (SentencePiece-style), Viterbi hard-EM.

The BPE sibling (operators/bpe.py) learns a merge LIST; this learns a
scored piece VOCABULARY and segments by best-path decode — the other
public tokenizer family (Kudo 2018, "Subword Regularization"; the
SentencePiece unigram model). Shares bpe's ASCII pretokenizer, so both
tokenizers partition the same pretoken stream and compose with the same
token-budget operators.

Deliberate variant, stated honestly: full SentencePiece trains with
SOFT EM (forward-backward expected counts, float likelihoods) and
samples segmentations. This module uses HARD EM — the E-step assigns
each word its single Viterbi-best segmentation under the current scores
and counts pieces along it — with all scores quantized to INTEGER
micrologs (round(1e6*ln p), the operators/lm and operators/langid
discipline). Hard EM is the standard deterministic simplification of
the same objective, and integer scoring is what makes the engine's
guarantee possible: ``method="distributed"`` ==
``method="local"`` == the pure-Python replay, bit-for-bit (no float
accumulation order anywhere; every cross-path number is a long).

Training shape at 100 TB:
- ONE corpus-sized job (bpe.word_frequencies: explode + count) — every
  later step runs on the distinct-word frame (Heaps' law);
- seed vocab: all corpus characters + the top ``seed_size`` substrings
  (len 2..max_piece_len) by total weighted count — a JVM substring
  explode + map-side-combined sum + deterministic (count desc, piece
  asc) top-K;
- each EM round: one Arrow-batched Viterbi pass over distinct words
  (scores broadcast in the UDF closure), one explode+sum for piece
  usage, one O(vocab) collect for the driver-side M-step + prune.
  Rounds are bounded (default 4); the driver never holds more than the
  vocabulary.

Determinism: Viterbi ties break (higher score, then FEWER pieces, then
longest-last-piece) — fixed iteration order, no dict-order dependence;
M-step and pruning order by (usage desc, piece asc). Same corpus ->
same model, independent of partitioning.
"""

from __future__ import annotations

import math
from typing import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from dca_manager_spark.operators.bpe import (
    pretokenize,
    pretokenize_col,
    word_frequencies,
)

_SCALE = 1_000_000
# Score assigned to a character absent from the vocabulary at APPLY
# time (unseen at training): far below any trained microlog, so it is
# only used when nothing else can cover the position — the UNK-char
# fallback that keeps reconstruction exact on any input.
UNK_PENALTY = -100_000_000

UNIGRAM_FAMILY = "unigram-viterbi-hardem-ascii-v1"


def viterbi_segment(
    word: str, scores: dict[str, int], max_piece_len: int
) -> tuple[list[str], int]:
    """Best segmentation of one pretoken under integer piece scores:
    maximize the score SUM over pieces (DP over end positions).
    Unknown single characters fall back to UNK_PENALTY so every word
    segments (and reconstructs) even with out-of-vocab characters.

    Ties: higher score, then fewer pieces, then the candidate whose
    LAST piece is longest (i.e. smallest split point) — checked in a
    fixed j-ascending scan, so the result never depends on dict order.
    Returns (pieces, total_score)."""
    n = len(word)
    # best[i] = (score, n_pieces, split_j) for word[:i]
    best: list[tuple[int, int, int] | None] = [None] * (n + 1)
    best[0] = (0, 0, -1)
    for i in range(1, n + 1):
        cur: tuple[int, int, int] | None = None
        for j in range(max(0, i - max_piece_len), i):
            prev = best[j]
            if prev is None:
                continue
            piece = word[j:i]
            s = scores.get(piece)
            if s is None:
                if i - j > 1:
                    continue
                s = UNK_PENALTY
            cand = (prev[0] + s, prev[1] + 1, j)
            if (
                cur is None
                or cand[0] > cur[0]
                or (cand[0] == cur[0] and cand[1] < cur[1])
                or (
                    cand[0] == cur[0]
                    and cand[1] == cur[1]
                    and cand[2] < cur[2]
                )
            ):
                cur = cand
        best[i] = cur
    pieces: list[str] = []
    i = n
    while i > 0:
        assert best[i] is not None  # chars always segmentable
        j = best[i][2]
        pieces.append(word[j:i])
        i = j
    pieces.reverse()
    return pieces, best[n][0]


def _mstep(usage: dict[str, int]) -> dict[str, int]:
    """Integer microlog re-estimation with add-one smoothing — the one
    place a float appears (math.log), always executed DRIVER-SIDE on
    the collected O(vocab) usage dict, so every path rounds the same
    doubles to the same longs."""
    total = sum(usage.values())
    v = len(usage)
    return {
        p: round(_SCALE * math.log((c + 1) / (total + v)))
        for p, c in usage.items()
    }


def _prune(
    usage: dict[str, int], chars: set[str], keep: int
) -> dict[str, int]:
    """Keep every single character (segmentability floor) plus the top
    multi-char pieces by (usage desc, piece asc) up to ``keep`` total."""
    multi = sorted(
        ((p, c) for p, c in usage.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    kept = {p: usage.get(p, 0) for p in chars}
    for p, c in multi[: max(keep - len(kept), 0)]:
        kept[p] = c
    return kept


def _seed_local(
    word_freqs: list[tuple[str, int]], seed_size: int, max_piece_len: int
) -> tuple[dict[str, int], set[str]]:
    counts: dict[str, int] = {}
    chars: set[str] = set()
    for word, freq in word_freqs:
        for ch in set(word):
            chars.add(ch)
        for ln in range(1, max_piece_len + 1):
            for j in range(len(word) - ln + 1):
                piece = word[j:j + ln]
                counts[piece] = counts.get(piece, 0) + freq
    multi = sorted(
        ((p, c) for p, c in counts.items() if len(p) > 1),
        key=lambda pc: (-pc[1], pc[0]),
    )
    seed = {p: counts[p] for p in chars}
    for p, c in multi[:seed_size]:
        seed[p] = c
    return seed, chars


def _em_rounds(
    segment_and_count,
    seed_usage: dict[str, int],
    chars: set[str],
    vocab_size: int,
    rounds: int,
) -> dict[str, int]:
    """The shared EM driver: ``segment_and_count(scores)`` returns the
    piece-usage dict of one hard-E-step (both paths implement it with
    the SAME viterbi_segment; only where the words live differs)."""
    usage = seed_usage
    for r in range(rounds):
        scores = _mstep(usage)
        counted = segment_and_count(scores)
        # Unused pieces drop out (usage 0 -> absent); chars stay.
        usage = {p: c for p, c in counted.items() if c > 0}
        for ch in chars:
            usage.setdefault(ch, 0)
        # Gradual prune toward the target (SentencePiece's shrink
        # schedule, integerized): keep 75% of the current surplus.
        surplus = max(len(usage) - vocab_size, 0)
        usage = _prune(usage, chars, vocab_size + (surplus * 3) // 4)
    usage = _prune(usage, chars, vocab_size)
    return _mstep(usage)


def train_unigram_model(
    df: DataFrame,
    vocab_size: int = 512,
    text_col: str = "text",
    max_piece_len: int = 6,
    seed_size: int = 2048,
    rounds: int = 4,
    method: str = "distributed",
    max_words: int = 262_144,
) -> dict[str, int]:
    """Learn {piece: integer microlog score}. ``method="distributed"``
    keeps the word frame in Spark (Viterbi as an Arrow-batched UDF per
    round); ``method="local"`` collects the top ``max_words`` distinct
    words (freq desc, word asc — a bounded driver-side model fit, the
    bpe.train_bpe_merges discipline) and runs the identical loop in
    pure Python. Bit-identical results whenever the vocabulary fits
    the cap (pinned in tests)."""
    if method not in ("distributed", "local"):
        raise ValueError(f"unknown method {method!r}")
    words = word_frequencies(df, text_col)
    if method == "local":
        rows = (
            words.orderBy(F.col("freq").desc(), F.col("word"))
            .limit(max_words)
            .collect()
        )
        wf = [(r["word"], r["freq"]) for r in rows]
        return train_unigram_model_py(
            wf,
            vocab_size=vocab_size,
            max_piece_len=max_piece_len,
            seed_size=seed_size,
            rounds=rounds,
        )

    words = words.localCheckpoint(eager=True)  # pin: consumed per round
    # -- seed: substring explode, weighted count, deterministic top-K --
    pieces = words.select(
        "freq",
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(1), F.lit(max_piece_len)),
                    lambda ln: F.transform(
                        F.sequence(
                            F.lit(1),
                            F.greatest(
                                F.length("word") - ln + 1, F.lit(0)
                            ),
                        ),
                        lambda j: F.substring(F.col("word"), j, ln),
                    ),
                )
            )
        ).alias("piece"),
    ).filter(F.length("piece") > 0)
    counts = pieces.groupBy("piece").agg(
        F.sum("freq").cast("long").alias("cnt")
    )
    char_counts = {
        r["piece"]: r["cnt"]
        for r in counts.filter(F.length("piece") == 1).collect()
    }
    chars = set(char_counts)
    top_multi = (
        counts.filter(F.length("piece") > 1)
        .orderBy(F.col("cnt").desc(), F.col("piece"))
        .limit(seed_size)
        .collect()
    )
    seed = dict(char_counts)
    seed.update({r["piece"]: r["cnt"] for r in top_multi})

    def segment_and_count(scores: dict[str, int]) -> dict[str, int]:
        from pyspark.sql.functions import pandas_udf

        @pandas_udf("array<string>")
        def seg(col):
            import pandas as pd

            return pd.Series(
                [
                    viterbi_segment(w, scores, max_piece_len)[0]
                    for w in col
                ]
            )

        counted = (
            words.select(F.explode(seg("word")).alias("piece"), "freq")
            .groupBy("piece")
            .agg(F.sum("freq").cast("long").alias("cnt"))
            .collect()
        )
        return {r["piece"]: r["cnt"] for r in counted}

    return _em_rounds(segment_and_count, seed, chars, vocab_size, rounds)


def train_unigram_model_py(
    word_freqs: Iterable[tuple[str, int]],
    vocab_size: int = 512,
    max_piece_len: int = 6,
    seed_size: int = 2048,
    rounds: int = 4,
) -> dict[str, int]:
    """Pure-Python replay over an explicit (word, freq) table — the test
    oracle for both Spark paths, and the local path's engine."""
    wf = list(word_freqs)
    seed, chars = _seed_local(wf, seed_size, max_piece_len)

    def segment_and_count(scores: dict[str, int]) -> dict[str, int]:
        usage: dict[str, int] = {}
        for word, freq in wf:
            for p in viterbi_segment(word, scores, max_piece_len)[0]:
                usage[p] = usage.get(p, 0) + freq
        return usage

    return _em_rounds(segment_and_count, seed, chars, vocab_size, rounds)


def unigram_tokenize_udf(model: dict[str, int], max_piece_len: int = 6):
    """Arrow-vectorized apply: text -> struct(tokens, n_tokens,
    n_pretokens, reconstruct) — the bpe_tokenize_udf contract, with
    Viterbi decode instead of merge replay; per-batch word cache, model
    rides the closure."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(
        "tokens array<string>, n_tokens int, n_pretokens int,"
        " reconstruct boolean"
    )
    def tok(col):
        import pandas as pd

        cache: dict[str, list[str]] = {}
        toks_out, nt_out, np_out, ok_out = [], [], [], []
        for text in col:
            if text is None:
                toks_out.append(None)
                nt_out.append(None)
                np_out.append(None)
                ok_out.append(None)
                continue
            pretoks = pretokenize(text)
            doc_toks: list[str] = []
            ok = True
            for w in pretoks:
                enc = cache.get(w)
                if enc is None:
                    enc = viterbi_segment(w, model, max_piece_len)[0]
                    cache[w] = enc
                doc_toks.extend(enc)
                if "".join(enc) != w:
                    ok = False
            toks_out.append(doc_toks)
            nt_out.append(len(doc_toks))
            np_out.append(len(pretoks))
            ok_out.append(ok)
        return pd.DataFrame(
            {
                "tokens": toks_out,
                "n_tokens": nt_out,
                "n_pretokens": np_out,
                "reconstruct": ok_out,
            }
        )

    return tok


def unigram_tokenize(
    df: DataFrame,
    model: dict[str, int],
    text_col: str = "text",
    out_col: str = "uni",
    max_piece_len: int = 6,
) -> DataFrame:
    """Attach ``out_col`` = struct(tokens, n_tokens, n_pretokens,
    reconstruct). One Arrow projection, no shuffle."""
    return df.withColumn(
        out_col,
        unigram_tokenize_udf(model, max_piece_len)(F.col(text_col)),
    )


def save_unigram_model(spark, model: dict[str, int], path: str) -> None:
    """Persist as a tiny parquet model table (piece, score, family) —
    same stored-model lifecycle as save_bpe_model: train once, apply
    with the SAME model forever after (rerun-stable token budgets)."""
    rows = [
        (p, s, UNIGRAM_FAMILY)
        for p, s in sorted(model.items())
    ]
    df = spark.createDataFrame(rows, "piece string, score long, family string")
    df.coalesce(1).write.mode("overwrite").parquet(path)


def load_unigram_model(spark, path: str) -> dict[str, int]:
    """Load, verifying the family tag LOUDLY (a model from a different
    pretokenizer/EM generation must fail, not quietly mis-segment)."""
    rows = spark.read.parquet(path).collect()
    families = {r["family"] for r in rows}
    if families and families != {UNIGRAM_FAMILY}:
        raise ValueError(
            f"unigram model at {path!r} has family {sorted(families)!r}, "
            f"this code is {UNIGRAM_FAMILY!r} — retrain before tokenizing"
        )
    return {r["piece"]: r["score"] for r in rows}
