#!/usr/bin/env python
"""A/B the pHash density controls at two corpus sizes (~400k and ~1.6M
images over sf0.1 docs).

Variants:
  * uncapped — fixed radius 6, no control (the r5 baseline: edges grew ×7.1
    for ×4 images, BENCH.md sf1 image row)
  * tier2    — independent-digest verify (dhash64 within
    phash_verify_max_hamming): the DIFFUSE-background control.  Expected
    near-linear edge growth: planted twins are ~linear in corpus size,
    random pHash collisions die on the second digest.
  * capped   — degree_cap (env PHASH_CAP, default 8): the DENSE-clique
    control.  Measured NOT to bind on this corpus (mean degree ~1; it
    exists for boilerplate mega-groups) — off by default here, enable
    with RUN_CAPPED=1.

Reports edge counts, growth factors, join walls, and planted-twin recall
(must stay >= 0.99 for every variant).

Run exclusively (no concurrent load):  python scripts/ab_phash_degree_cap.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fuzzymatch_spark.config import DedupConfig
from fuzzymatch_spark.operators.dedup import phash_band_edges
from fuzzymatch_spark.session import get_spark
from fuzzymatch_spark.sources.images import build_phash_df

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CAP = int(os.environ.get("PHASH_CAP", "8"))
CORES = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
RUN_CAPPED = os.environ.get("RUN_CAPPED", "0") == "1"


def run_at(rep: int) -> dict:
    spark = get_spark(app_name=f"ab-density-{rep}", master=f"local[{CORES}]")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if rep > 1:
        docs = docs.crossJoin(
            spark.range(rep).select(F.col("id").alias("r"))
        ).select(
            F.concat_ws("r", F.col("doc_id"), F.col("r")).alias("doc_id"),
            "text",
        )
    docs = docs.repartition(CORES * 4)
    narrow = build_phash_df(
        spark, docs, "doc_id", "text", with_dhash=True
    ).persist()
    n_images = narrow.count()
    n_twins = narrow.filter(F.col("image_id").endswith("_dup")).count()

    variants = [
        ("uncapped", DedupConfig(), None),
        ("tier2", DedupConfig(), "dhash"),
    ]
    if RUN_CAPPED:
        variants.append(("capped", DedupConfig(phash_degree_cap=CAP), None))

    out = {"rep": rep, "images": n_images, "twins": n_twins}
    for name, cfg, vcol in variants:
        t0 = time.time()
        edges = phash_band_edges(narrow, cfg, verify_col=vcol).persist()
        n_edges = edges.count()
        wall = time.time() - t0
        # canonical order puts the twin second: b_id == a_id || "_dup"
        twin_hits = edges.filter(
            F.col("b_id") == F.concat(F.col("a_id"), F.lit("_dup"))
        ).count()
        edges.unpersist()
        out[name] = {
            "edges": n_edges,
            "wall_s": round(wall, 2),
            "twin_recall": round(twin_hits / n_twins, 5),
        }
    narrow.unpersist()
    spark.stop()
    print(out, flush=True)
    return out


def main() -> None:
    lo = run_at(64)
    hi = run_at(256)
    img_growth = hi["images"] / lo["images"]
    for name in lo:
        if name in ("rep", "images", "twins"):
            continue
        growth = hi[name]["edges"] / max(lo[name]["edges"], 1)
        print(
            f"{name}: edges {lo[name]['edges']} -> {hi[name]['edges']} "
            f"(x{growth:.2f} for x{img_growth:.2f} images); "
            f"recall {lo[name]['twin_recall']}/{hi[name]['twin_recall']}"
        )


if __name__ == "__main__":
    main()
