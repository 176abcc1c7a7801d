"""TSV corpus source — the reference's corpus format.

The reference loads an instruments TSV with three field pools
(`Benchmarks/Benchmarks/CorpusBenchmark/CorpusBenchmark.swift:63-92`:
symbol, name, isin).  A reference user points this reader at the same file
and gets a DataFrame ready for ``top_matches_fields`` / the dedup pipeline.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def read_corpus_tsv(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    header: bool = False,
) -> DataFrame:
    """Read a TSV corpus; default column names follow the reference's
    (symbol, name, isin) field pools when 3 columns arrive headerless."""
    df = (
        spark.read.option("sep", "\t")
        .option("header", str(header).lower())
        .option("quote", "")  # the reference format is unquoted
        .csv(path)
    )
    if columns is None and not header and len(df.columns) == 3:
        columns = ["symbol", "name", "isin"]
    if columns:
        df = df.toDF(*columns)
    return df
