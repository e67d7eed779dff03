"""Curated column-function namespace — the engine's ``F``-style surface.

Users of the reference query a SQL table; users of this engine also get
composable column functions for the training-data operators. Import as:

    from dca_manager_spark import functions as EF
    docs.select(EF.token_count("text"), EF.lang_id("text"))
"""

from pyspark.sql import Column
from pyspark.sql import functions as F

from dca_manager_spark.operators.dedup import (
    char_shingles,
    hamming64,
    simhash64,
    word_shingles,
)
from dca_manager_spark.operators.sampling import hash_bucket
from dca_manager_spark.operators.similarity import qcosine, qdot, qnorm
from dca_manager_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint_md5,
    fingerprint_rolling,
    lang_id,
    normalize_text,
    punct_ratio,
    quality_score,
    stopword_count,
    stopword_ratio,
    token_count,
    tokens,
)


def _colify(fn):
    """Accept column names as strings, like pyspark.sql.functions."""

    def wrapped(col, *args, **kwargs):
        if isinstance(col, str):
            col = F.col(col)
        return fn(col, *args, **kwargs)

    wrapped.__name__ = fn.__name__
    wrapped.__doc__ = fn.__doc__
    return wrapped


tokens = _colify(tokens)
token_count = _colify(token_count)
bpe_ish_token_count = _colify(bpe_ish_token_count)
punct_ratio = _colify(punct_ratio)
stopword_count = _colify(stopword_count)
stopword_ratio = _colify(stopword_ratio)
quality_score = _colify(quality_score)
lang_id = _colify(lang_id)
normalize_text = _colify(normalize_text)
fingerprint_md5 = _colify(fingerprint_md5)
fingerprint_rolling = _colify(fingerprint_rolling)
char_shingles = _colify(char_shingles)
word_shingles = _colify(word_shingles)
hash_bucket = _colify(hash_bucket)

__all__ = [
    "tokens", "token_count", "bpe_ish_token_count", "punct_ratio",
    "stopword_count", "stopword_ratio", "quality_score", "lang_id",
    "normalize_text", "fingerprint_md5", "fingerprint_rolling",
    "char_shingles", "word_shingles", "simhash64", "hamming64",
    "hash_bucket", "qdot", "qnorm", "qcosine",
]
