"""Exact repeated-substring (boilerplate) detection.

Engine-only stage required by the north rule (SURVEY.md §2.10): detect
caption pairs sharing an exact run of >= L characters.  Conceptual ancestor:
the reference's exact-substring early exit
(`Sources/FuzzyMatch/EditDistance.swift:258-261`).

Relational formulation: explode every length-L substring (optionally
*winnowed*: keep only substrings whose hash ≡ 0 (mod k)) -> equi-join on the
substring -> distinct pairs.  With winnowing the emitted-row count drops by
k× while any shared run of length >= L + k - 1 is still guaranteed to share
a sampled window (standard winnowing/minimizer argument) — that is the
10^12-row path.  ``winnow_k=1`` is the exact small-scale/oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def substring_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    run_len: int = 32,
    winnow_k: int = 1,
) -> DataFrame:
    """(id, sub) for each distinct length-``run_len`` window (winnowed)."""
    idxs = F.sequence(
        F.lit(1), F.greatest(F.length("t") - F.lit(run_len - 1), F.lit(0))
    )
    out = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .filter(F.length("t") >= run_len)
        .select(
            "id",
            F.explode(
                F.array_distinct(
                    F.transform(idxs, lambda i: F.substring(F.col("t"), i, run_len))
                )
            ).alias("sub"),
        )
    )
    if winnow_k > 1:
        out = out.filter(F.pmod(F.xxhash64("sub"), F.lit(winnow_k)) == 0)
    return out


def suffix_run_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    run_len: int = 32,
    winnow_k: int = 1,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Distinct (a_id, b_id) sharing an exact >= run_len substring."""
    subs = substring_windows(df, id_col, text_col, run_len, winnow_k)
    sizes = subs.groupBy("sub").agg(F.count("*").alias("n"))
    subs = subs.join(
        sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket_size)).select("sub"),
        on="sub",
    )
    a = subs.alias("a")
    b = subs.alias("b")
    return (
        a.join(b, on="sub")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
        .withColumn("source", F.lit("suffix"))
    )
