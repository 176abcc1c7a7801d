"""Bucketed-table layout for exchange-free co-located joins.

At 100 TB the dominant cost of a repeated equi-join (signatures ⋈ edges,
assignments ⋈ docs, ...) is re-shuffling both sides on every run.
Writing the tables bucketed on the join key amortizes that shuffle into
the write: both sides land hash-partitioned into the same N buckets, and
Spark's bucketed-scan join matches them bucket-for-bucket with ZERO
Exchange in the plan (sorted buckets also skip the Sort).

Use for the tables a pipeline joins repeatedly — the persisted signature
table, cluster assignments, canonical corpus — not for one-shot
intermediates (one write-side shuffle only pays for itself after the
second join).  Bucket counts must match across tables that join; pick N
near the cluster's target task count for the table's size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int,
    sort: bool = True,
) -> None:
    """Persist ``df`` as a bucketed (and by default sorted) table on
    ``bucket_col``.  Joins between tables bucketed with the SAME column
    and count compile to exchange-free (and sort-free) plans."""
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    w = (
        df.write.mode("overwrite")
        .format("parquet")
        .bucketBy(n_buckets, bucket_col)
    )
    if sort:
        w = w.sortBy(bucket_col)
    w.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two bucketed tables on their bucket column.  This is a plain
    join — the point is the PLAN it compiles to: bucket-aligned scans,
    no Exchange on either side (asserted by the plan test)."""
    return spark.table(left_table).join(spark.table(right_table), on)
