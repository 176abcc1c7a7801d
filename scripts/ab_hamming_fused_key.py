#!/usr/bin/env python
"""A/B: Hamming pair-join keyed by ONE fused int64 (band folded into the
key's high bits) vs the former (band, key) struct grouping — same 400k
images, both core counts, alternating reps, identical edge counts
asserted.  Run exclusively (no concurrent load)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("AB_REP", "64"))
ROUNDS = int(os.environ.get("AB_ROUNDS", "3"))


def old_edges(narrow, cfg):
    """The pre-change plan: (band, key) struct grouping."""
    from fuzzymatch_spark.operators.dedup import hamming_band_keys

    k = min(cfg.phash_max_hamming, 8 - 1)
    bands = hamming_band_keys(narrow, "image_id", "phash", 8,
                              cfg.phash_max_hamming, split_band_key=True)
    grouped = (
        bands.groupBy("band", "key")
        .agg(F.collect_list(F.struct("id", "phash")).alias("ms"))
        .filter((F.size("ms") > 1) & (F.size("ms") <= cfg.max_bucket_size))
    )
    return (
        grouped.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(
            F.bit_count(F.col("a.phash").bitwiseXOR(F.col("b.phash")))
            <= F.lit(k)
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
    )


def main() -> None:
    from fuzzymatch_spark.config import DedupConfig
    from fuzzymatch_spark.operators.dedup import phash_band_edges
    from fuzzymatch_spark.session import get_spark
    from fuzzymatch_spark.sources.images import build_phash_df

    cfg = DedupConfig()
    for cores in (8, 32):
        try:
            os.sched_setaffinity(0, set(range(cores)))
        except OSError:
            pass
        spark = get_spark(
            app_name=f"ab-fused-key-{cores}",
            master=f"local[{cores}]",
            extra_conf={
                "spark.sql.execution.arrow.maxRecordsPerBatch": "50000"
            },
        )
        docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
        docs = docs.repartition(cores * 4)
        docs = docs.crossJoin(
            F.broadcast(spark.range(REP).select(F.col("id").alias("rep")))
        ).select(
            F.concat_ws("r", F.col("doc_id"), F.col("rep")).alias("doc_id"),
            "text",
        )
        narrow = build_phash_df(spark, docs, "doc_id", "text").persist()
        n = narrow.count()
        # warmup both plans once (JIT)
        c_new = phash_band_edges(narrow, cfg).count()
        c_old = old_edges(narrow, cfg).count()
        assert c_new == c_old, (c_new, c_old)
        walls = {"old": [], "new": []}
        for _ in range(ROUNDS):
            for name, fn in (("old", lambda: old_edges(narrow, cfg)),
                             ("new", lambda: phash_band_edges(narrow, cfg))):
                t0 = time.time()
                cnt = fn().count()
                walls[name].append(round(time.time() - t0, 3))
                assert cnt == c_new
        print(f"cores={cores} images={n} edges={c_new} "
              f"old={walls['old']} min={min(walls['old'])} "
              f"new={walls['new']} min={min(walls['new'])}",
              flush=True)
        narrow.unpersist()
        spark.stop()


if __name__ == "__main__":
    main()
