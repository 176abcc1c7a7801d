#!/usr/bin/env python
"""Scale probe for the image-curation metadata stages (gate ->
aspect buckets -> deterministic micro-batches) over a MATERIALIZED
parquet metadata table — the production shape (the first probe draft
timed `spark.range` + format_string synthesis and measured string
allocation, not the operators; from parquet the gate+buckets stage
tracks the hardware ceiling almost exactly).

The chain is a scan-level projection+filter plus ONE exchange (the
(bucket, shard) window behind batch_idx).  Reports stage walls and
rows/s at two core counts, the scaling ratio, and efficiency vs the
same-host parallel ceiling (bench.py's kernel).  Run exclusively.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N = int(os.environ.get("CURATION_N", "40000000"))
BATCH = 1024
SHARDS = 64
META = os.environ.get("CURATION_META", "/tmp/curation_probe_meta")


def meta_table(spark, n: int):
    return spark.range(n).select(
        F.format_string("img_%09d", F.col("id")).alias("image_id"),
        (F.lit(32) + (F.col("id") * 7919) % 1200).cast("int").alias("w"),
        (F.lit(32) + (F.col("id") * 104729) % 1200).cast("int").alias("h"),
        F.when(F.col("id") % 11 == 0, F.lit("gif"))
        .when(F.col("id") % 2 == 0, F.lit("png"))
        .otherwise(F.lit("jpeg")).alias("fmt"),
        F.concat(
            F.lit("photo of item "), F.col("id"),
            F.lit(" in a scene with several descriptive caption words"),
        ).alias("caption"),
    )


def run(master: str, cores: int):
    from fuzzymatch_spark.operators.multimodal import (
        aspect_buckets,
        bucket_batches,
        image_caption_gate,
    )
    from fuzzymatch_spark.session import get_spark

    spark = get_spark(app_name=f"curation_probe_{cores}", master=master,
                      shuffle_partitions=2 * cores)
    meta = spark.read.parquet(META)
    meta.count()  # warm page cache so both core counts read warm

    t0 = time.time()
    g = aspect_buckets(image_caption_gate(meta))
    kept = g.filter(F.col("keep")).count()
    t1 = time.time()

    b = bucket_batches(
        aspect_buckets(image_caption_gate(meta)).filter(F.col("keep")),
        batch_size=BATCH, n_shards=SHARDS, id_col="image_id",
    )
    agg = b.groupBy("bucket_w", "bucket_h", "shard", "batch_idx").count()
    stats = agg.agg(
        F.sum("count").alias("kept"),
        F.count(F.lit(1)).alias("n_batches"),
        F.sum((F.col("count") == BATCH).cast("long")).alias("full"),
    ).collect()[0]
    t2 = time.time()
    # every (bucket, shard) has at most one non-full (trailing) batch
    assert agg.filter(F.col("count") != BATCH) \
        .groupBy("bucket_w", "bucket_h", "shard").count() \
        .filter(F.col("count") > 1).count() == 0
    assert int(stats["kept"]) == kept
    spark.stop()
    chain = t2 - t1
    return {
        "cores": cores, "rows": N, "kept": kept,
        "n_batches": int(stats["n_batches"]),
        "full_batches": int(stats["full"]),
        "gate_buckets_s": round(t1 - t0, 2),
        "full_chain_s": round(chain, 2),
        "rows_per_s": round(N / chain, 0),
    }


def main():
    from bench import hw_ceiling_at
    from fuzzymatch_spark.session import get_spark

    if not os.path.exists(os.path.join(META, "_SUCCESS")):
        spark = get_spark(app_name="curation_probe_mkmeta",
                          master="local[32]", shuffle_partitions=64)
        meta_table(spark, N).write.mode("overwrite").parquet(META)
        spark.stop()

    r8 = run("local[8]", 8)
    r32 = run("local[32]", 32)
    # same-host parallel ceiling (bench.py's interleaved kernel): 8->32
    # never reaches 4x here (SMT + memory bandwidth), so efficiency is
    # graded against what the hardware itself achieves
    c8, c32 = hw_ceiling_at(8), hw_ceiling_at(32)
    ceiling = c8 / c32 if c32 else float("nan")
    sx = r32["rows_per_s"] / r8["rows_per_s"]
    print(json.dumps({
        "local8": r8, "local32": r32,
        "scaling_x": round(sx, 2),
        "gate_scaling_x": round(
            r8["gate_buckets_s"] / r32["gate_buckets_s"], 2
        ),
        "hw_ceiling_x": round(ceiling, 2),
        "efficiency_vs_ceiling": round(sx / ceiling, 3),
    }))
    assert r8["kept"] == r32["kept"]
    assert r8["n_batches"] == r32["n_batches"]


if __name__ == "__main__":
    main()
