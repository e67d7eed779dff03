"""Fuzzy string matching / entity resolution: blocked edit-distance
candidate pairs.

The naive formulation — levenshtein over ALL name pairs — is an O(n^2)
cross join: dead at any real entity-table size. The scalable shape is
the classic blocking strategy every dedupe/record-linkage system uses
(and the same candidates-then-verify pattern as the MinHash/SimHash
operators in operators/dedup.py):

1. derive a cheap BLOCKING KEY per record (first token, soundex-ish
   prefix, length band, ...) — anything that near-matches almost always
   share;
2. equi-join records on the blocking key (a hash join that shuffles each
   record once — never a cartesian);
3. verify only within-block pairs with the exact edit-distance predicate
   (JVM ``levenshtein``, codegen'd).

Recall is governed by the blocking function (records in different blocks
are never compared — multi-pass with a second key raises recall, same
OR-amplification idea as multi-table LSH); precision by ``max_dist``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def blocked_levenshtein_pairs(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block: Column,
    max_dist: int,
) -> DataFrame:
    """Candidate pairs (id_a < id_b) whose ``name_col`` values share a
    block and are within ``max_dist`` edits. ``block`` is a Column
    expression evaluated against ``df`` (e.g. the name's first token).
    Output: id_a, name_a, id_b, name_b, dist."""
    if max_dist < 0:
        raise ValueError(f"max_dist must be >= 0, got {max_dist}")
    keyed = df.select(
        F.col(id_col).alias("__id"),
        F.col(name_col).alias("__name"),
        block.alias("__blk"),
    )
    a = keyed.select(
        F.col("__id").alias("id_a"),
        F.col("__name").alias("name_a"),
        F.col("__blk").alias("__blk_a"),
    )
    b = keyed.select(
        F.col("__id").alias("id_b"),
        F.col("__name").alias("name_b"),
        F.col("__blk").alias("__blk_b"),
    )
    return (
        a.join(
            b,
            (F.col("__blk_a") == F.col("__blk_b"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= max_dist)
        .drop("__blk_a", "__blk_b")
    )


def first_token_block(name_col: str) -> Column:
    """The simplest useful blocking key: the name's first token."""
    return F.split_part(F.col(name_col), F.lit(" "), F.lit(1))
