"""Partition-width guard for CPU-bound Python stages.

A single-row-group parquet file scans as ONE partition, which would
serialize a CPU-bound Arrow-UDF stage onto one core.  The guard
repartitions such inputs up to the session's default parallelism.

Probe cost matters on hot API paths: the Python ``df.rdd`` property
builds a fresh Python-conversion RDD (plan -> JavaRDD[pickle] pipeline)
on EVERY access.  The probe here reads the JVM Dataset's ``rdd`` lazy
val instead — the physical RDD is planned once and cached on the Dataset,
and no Python serializer pipeline is constructed — so repeated calls on
the same DataFrame are free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def plan_num_partitions(df: DataFrame) -> int:
    """Partition count of ``df``'s physical plan (cached JVM probe)."""
    return df._jdf.rdd().getNumPartitions()


def ensure_min_partitions(
    df: DataFrame, min_partitions: int | None = None
) -> DataFrame:
    """Return ``df`` repartitioned to ``min_partitions`` iff its plan has
    fewer partitions; defaults to the session's default parallelism.
    At scale (inputs already wider than the core count) this is a no-op
    probe — the repartition exchange only appears for narrow inputs."""
    if min_partitions is None:
        min_partitions = df.sparkSession.sparkContext.defaultParallelism
    if plan_num_partitions(df) < min_partitions:
        return df.repartition(min_partitions)
    return df
