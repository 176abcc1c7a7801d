#!/usr/bin/env python
"""Profile the scaling job's two components (image build vs band join) at
two parallelism levels to locate the non-scaling cost."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fuzzymatch_spark.config import DedupConfig
from fuzzymatch_spark.operators.dedup import phash_band_edges
from fuzzymatch_spark.session import get_spark
from fuzzymatch_spark.sources.images import build_images_df

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REP = int(os.environ.get("REP", "64"))
REPEATS = int(os.environ.get("REPEATS", "2"))


def run_at(cores: int) -> None:
    spark = get_spark(app_name=f"prof-{cores}", master=f"local[{cores}]")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if REP > 1:
        docs = docs.crossJoin(
            spark.range(REP).select(F.col("id").alias("rep"))
        ).select(
            F.concat_ws("r", F.col("doc_id"), F.col("rep")).alias("doc_id"),
            "text",
        )
    docs = docs.repartition(cores * 4)

    # warmup
    build_images_df(spark, docs.limit(2000), "doc_id", "text").select(
        "image_id", "phash"
    ).count()

    best_build = best_join = None
    for _ in range(REPEATS):
        t0 = time.time()
        narrow = build_images_df(spark, docs, "doc_id", "text").select(
            "image_id", "phash"
        ).persist()
        n_img = narrow.count()
        tb = time.time() - t0

        t0 = time.time()
        n_edges = phash_band_edges(narrow, DedupConfig()).count()
        tj = time.time() - t0
        narrow.unpersist()
        best_build = tb if best_build is None else min(best_build, tb)
        best_join = tj if best_join is None else min(best_join, tj)
    print(
        f"cores={cores} images={n_img} edges={n_edges} "
        f"build={best_build:.2f}s join={best_join:.2f}s "
        f"img/s_build={n_img/best_build:.0f}"
    )
    spark.stop()


if __name__ == "__main__":
    for cores in (8, 32):
        run_at(cores)
