"""Distributed fuzzy-grep: the reference's fuzzygrep pipeline
(`Examples/fuzzygrep/Sources/FuzzyGrep.swift:59-254`) as a Spark dataflow.

The reference's shape — 1 stdin reader chunking 4096-line blocks round-robin
to N scoring workers, then an ordered re-merge by sequence number — maps to:

    spark.read.text (splittable input replaces the chunking reader)
      -> monotonically-increasing line ids (the sequence numbers)
      -> column prefilters + score UDF   (the N workers)
      -> orderBy(line_id)                (the ordered writer)

Ordering is by key instead of arrival, so the plan is deterministic and the
sort is a proper distributed sort rather than a single-threaded reorder
buffer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from fuzzymatch_spark.config import MatchConfig
from fuzzymatch_spark.operators.topk import score_candidates


def fuzzy_grep(
    spark: SparkSession,
    path_or_df: str | DataFrame,
    query: str,
    config: MatchConfig | None = None,
) -> DataFrame:
    """Matching lines of a text source, in original line order, with score.

    ``path_or_df``: a text file/directory path (read with ``spark.read.text``)
    or an existing single-string-column DataFrame.
    """
    config = config or MatchConfig(min_score=0.5)
    if isinstance(path_or_df, str):
        df = spark.read.text(path_or_df)
        col = "value"
    else:
        df = path_or_df
        col = df.columns[0]
    lines = df.withColumn("line_id", F.monotonically_increasing_id())
    scored = score_candidates(lines, col, query, config)
    return scored.select(
        "line_id", F.col(col).alias("line"), "score", "kind"
    ).orderBy("line_id")
