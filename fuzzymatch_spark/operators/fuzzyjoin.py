"""Fuzzy self-join on plain Levenshtein distance.

A data-pipeline utility the reference's API implies but never distributes
(its `matches` loop scores one query against a corpus;
`Sources/FuzzyMatch/FuzzyMatcher+Convenience.swift:116-131`): find ALL
token pairs within edit distance k — vocabulary normalization, typo
clustering, alias mining.

Plan shape (scales, never all-pairs, never length-class-quadratic):

    distinct tokens
      -> PASS-JOIN segment blocking (Li/Deng/Feng, PVLDB 5(3), 2011):
         the index side partitions each token of length l into k+1
         segments; the probe side emits, for every admissible partner
         length l in [len(a), len(a)+k], every substring of a that could
         equal segment i of a length-l partner (position window +-k).
         Pigeonhole: <= k errors spread over k+1 segments leave >= 1
         segment error-free, so the (l, i, segment) equi-join has 100%
         recall while the keys are short exact substrings — candidates
         shrink from "every same-length pair" to "pairs sharing an exact
         aligned segment".  This mirrors the reference's cascade doctrine
         (cheap exact filters ahead of the expensive kernel,
         `Sources/FuzzyMatch/Prefilters.swift:20-27`) in relational form.
      -> residual short-token pool: tokens shorter than k+1 cannot be
         segmented; any pair containing one has BOTH sides <= 2k chars, so
         the tiny <=2k-length pool keeps the old length-band equi-join
         (bounded by the alphabet, not the vocabulary).
      -> dropDuplicates (a true pair can meet under several segment keys)
      -> Arrow-batched plain-Levenshtein verify
         (kernels/editdist.batch_levenshtein).

Plain Levenshtein (not the reference's OSA-DL) because it is the
cross-engine-checkable form: DuckDB ``levenshtein`` is unambiguous, so the
driver oracle hash-checks this operator end-to-end; the reference's
OSA/prefix/substring kernels remain golden-fixture-pinned instead.

All key generation is JVM-side column expressions; Python appears only in
the final verify over the (already tiny) candidate set.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import IntegerType


def make_levenshtein_udf(max_ed: int):
    from fuzzymatch_spark.kernels.editdist import batch_levenshtein

    @F.pandas_udf(IntegerType())
    def lev(a: pd.Series, b: pd.Series) -> pd.Series:
        qa = [(x or "").encode("utf-8") for x in a]
        qb = [(x or "").encode("utf-8") for x in b]
        return pd.Series(batch_levenshtein(qa, qb, max_ed))

    return lev


def _seg_geometry(l: Column, i: int, k: int) -> tuple[Column, Column]:
    """(start0, seglen) of segment i in the even k+1-partition of a
    length-``l`` string: the first (k+1 - l%(k+1)) segments get floor(l/(k+1))
    chars, the rest one extra."""
    nseg = k + 1
    base = F.floor(l / nseg).cast("int")
    rem = (l % nseg).cast("int")
    n_short = F.lit(nseg) - rem  # segments of length `base`
    extra = F.greatest(F.lit(i) - n_short, F.lit(0))  # +1s before segment i
    start = F.lit(i) * base + extra
    seglen = base + F.when(F.lit(i) >= n_short, F.lit(1)).otherwise(F.lit(0))
    return start, seglen


def _passjoin_candidates(toks: DataFrame, max_ed: int) -> DataFrame:
    """(a_token, b_token) candidate pairs via segment blocking; complete for
    pairs where both tokens have >= max_ed+1 chars."""
    k = max_ed
    long_toks = toks.filter(F.length("token") >= k + 1)

    # index side: token of length l -> (l, i, segment_i)
    l_idx = F.length("token")
    idx_keys = []
    for i in range(k + 1):
        start, seglen = _seg_geometry(l_idx, i, k)
        idx_keys.append(
            F.struct(
                l_idx.alias("l"),
                F.lit(i).alias("i"),
                F.substring(F.col("token"), start + 1, seglen).alias("seg"),
            )
        )
    index = long_toks.select(
        F.col("token").alias("b_token"), F.explode(F.array(*idx_keys)).alias("kk")
    ).select("b_token", F.col("kk.l").alias("l"), F.col("kk.i").alias("i"),
             F.col("kk.seg").alias("seg"))

    # probe side: for each admissible partner length l >= len(a) and each
    # segment slot i, every substring of `a` inside the +-k position window
    la = F.length("token")
    probe_arrays = []

    def _probe_struct(l, i, seglen):
        def go(s):
            return F.struct(
                l.cast("int").alias("l"),
                F.lit(i).alias("i"),
                F.substring(F.col("token"), s + 1, seglen).alias("seg"),
            )

        return go

    for dl in range(k + 1):
        l = la + dl
        for i in range(k + 1):
            start, seglen = _seg_geometry(l, i, k)
            lo = F.greatest(start - k, F.lit(0))
            hi = F.least(start + k, la - seglen)
            probe_arrays.append(
                F.when(
                    (l >= k + 1) & (lo <= hi),
                    F.transform(F.sequence(lo, hi), _probe_struct(l, i, seglen)),
                ).otherwise(F.array().cast("array<struct<l:int,i:int,seg:string>>"))
            )
    probe = long_toks.select(
        F.col("token").alias("a_token"),
        F.explode(F.flatten(F.array(*probe_arrays))).alias("kk"),
    ).select("a_token", F.col("kk.l").cast("int").alias("l"),
             F.col("kk.i").alias("i"), F.col("kk.seg").alias("seg"))

    idx2 = index.withColumn("l", F.col("l").cast("int"))
    return (
        probe.join(idx2, on=["l", "i", "seg"])
        .filter(F.col("a_token") != F.col("b_token"))
        .select(
            F.least("a_token", "b_token").alias("a_token"),
            F.greatest("a_token", "b_token").alias("b_token"),
        )
    )


def _short_pool_candidates(toks: DataFrame, max_ed: int) -> DataFrame:
    """Pairs whose shorter side has <= max_ed chars (unsegmentable): both
    sides then have <= 2*max_ed chars, so the length-band join runs on a
    pool bounded by the alphabet, not the vocabulary."""
    k = max_ed
    short = toks.filter(F.length("token") <= k)
    pool = toks.filter(F.length("token") <= 2 * k)
    a = short.select(
        F.col("token").alias("a_token"),
        F.explode(
            F.sequence(
                F.greatest(F.length("token") - k, F.lit(1)),
                F.length("token") + k,
            )
        ).alias("cand_len"),
    )
    b = pool.select(F.col("token").alias("b_token"),
                    F.length("token").alias("cand_len"))
    return (
        a.join(b, on="cand_len")
        .filter(F.col("a_token") != F.col("b_token"))
        .select(
            F.least("a_token", "b_token").alias("a_token"),
            F.greatest("a_token", "b_token").alias("b_token"),
        )
    )


def fuzzy_token_candidates(toks: DataFrame, max_ed: int) -> DataFrame:
    """Deduplicated candidate pairs ahead of the Levenshtein verify —
    exposed for plan/count tests."""
    return (
        _passjoin_candidates(toks, max_ed)
        .unionByName(_short_pool_candidates(toks, max_ed))
        .dropDuplicates(["a_token", "b_token"])
    )


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
    cand = fuzzy_token_candidates(toks, max_ed)
    lev = make_levenshtein_udf(max_ed)
    return (
        cand.withColumn("dist", lev(F.col("a_token"), F.col("b_token")))
        .filter(F.col("dist") <= F.lit(max_ed))
        .select(
            F.col("a_token").alias(token_col_a),
            F.col("b_token").alias(token_col_b),
            F.col("dist").cast("long").alias("dist"),
        )
    )
