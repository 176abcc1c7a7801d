"""Fuzzy self-join on plain Levenshtein distance.

A data-pipeline utility the reference's API implies but never distributes
(its `matches` loop scores one query against a corpus;
`Sources/FuzzyMatch/FuzzyMatcher+Convenience.swift:116-131`): find ALL
token pairs within edit distance k — vocabulary normalization, typo
clustering, alias mining.

Plan shape (scales, never all-pairs):

    distinct tokens -> LENGTH-BAND equi-join (|len(a)-len(b)| <= k is
    necessary for distance <= k; the a-side explodes to its 2k+1 admissible
    candidate lengths, the b-side keys by exact length) -> Arrow-batched
    plain-Levenshtein verify (kernels/editdist.batch_levenshtein).

Plain Levenshtein (not the reference's OSA-DL) because it is the
cross-engine-checkable form: DuckDB ``levenshtein`` is unambiguous, so the
driver oracle hash-checks this operator end-to-end; the reference's
OSA/prefix/substring kernels remain golden-fixture-pinned instead.

At larger vocabularies add the char-bitmask prefilter as a second JVM
predicate before the Python stage (same cascade as operators/topk.py);
length banding alone already bounds the candidate set to
O(|V| * avg_bucket * (2k+1)).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import IntegerType


def make_levenshtein_udf(max_ed: int):
    from fuzzymatch_spark.kernels.editdist import batch_levenshtein

    @F.pandas_udf(IntegerType())
    def lev(a: pd.Series, b: pd.Series) -> pd.Series:
        qa = [(x or "").encode("utf-8") for x in a]
        qb = [(x or "").encode("utf-8") for x in b]
        return pd.Series(batch_levenshtein(qa, qb, max_ed))

    return lev


def fuzzy_token_join(
    df: DataFrame, col: str, max_ed: int = 2, token_col_a: str = "a_token",
    token_col_b: str = "b_token",
) -> DataFrame:
    """All distinct-token pairs (a < b) with Levenshtein(a, b) <= max_ed."""
    toks = (
        df.select(F.col(col).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )
    a = toks.select(
        F.col("token").alias(token_col_a),
        F.explode(
            F.sequence(
                F.greatest(F.octet_length("token") - max_ed, F.lit(1)),
                F.octet_length("token") + max_ed,
            )
        ).alias("cand_len"),
    )
    b = toks.select(
        F.col("token").alias(token_col_b),
        F.octet_length("token").alias("cand_len"),
    )
    lev = make_levenshtein_udf(max_ed)
    pairs = (
        a.join(b, on="cand_len")
        .filter(F.col(token_col_a) < F.col(token_col_b))
        .withColumn("dist", lev(F.col(token_col_a), F.col(token_col_b)))
        .filter(F.col("dist") <= F.lit(max_ed))
        .select(token_col_a, token_col_b, F.col("dist").cast("long").alias("dist"))
    )
    return pairs
