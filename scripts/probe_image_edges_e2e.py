#!/usr/bin/env python
"""End-to-end scale probe for the one-decode multi-leg composite
(`image_dedup_edges`): synthesize real PNG/JPEG bytes in-task, decode +
fused digests + the three candidate joins, at two core counts.

10% planted twins, round-robin across the three dup classes (re-encode /
mirror / banner) so every leg carries real work.  Reports wall, imgs/s,
per-leg edge counts, planted recall per class, and the two-core-count
ratio.  Run exclusively.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N = int(os.environ.get("E2E_N", "100000"))
TWIN_EVERY = 10  # one twin per 10 base images, class = (i//10) % 3


def build(spark, n: int):
    import numpy as np
    import pandas as pd

    from fuzzymatch_spark.sources.images import encode_image, synth_pixels

    def gen(batches):
        banner = np.full((16, 48), 235, dtype=np.uint8)
        banner[6:10, 4:44] = 20
        for pdf in batches:
            ids, blobs = [], []
            for rid in pdf["id"].astype(str):
                i = int(rid)
                px = synth_pixels(f"e_{rid}")
                fmt = "jpeg" if i % 2 else "png"
                ids.append(f"o_{rid}")
                blobs.append(encode_image(px, fmt, quality=95))
                if i % TWIN_EVERY == 0:
                    cls = (i // TWIN_EVERY) % 3
                    if cls == 0:
                        tw, pre = encode_image(px, "jpeg", quality=85), "re"
                    elif cls == 1:
                        tw = encode_image(
                            np.ascontiguousarray(np.fliplr(px)), "png")
                        pre = "mi"
                    else:
                        b = px.copy()
                        b[32:48, :] = banner
                        tw, pre = encode_image(b, "png"), "ba"
                    ids.append(f"{pre}_{rid}")
                    blobs.append(tw)
            yield pd.DataFrame({"image_id": ids, "bytes": blobs})

    return spark.range(n).repartition(64).mapInPandas(
        gen, "image_id string, bytes binary"
    )


def run(master: str, cores: int):
    from fuzzymatch_spark.config import DedupConfig
    from fuzzymatch_spark.operators.multimodal import image_dedup_edges
    from fuzzymatch_spark.session import get_spark

    spark = get_spark(app_name=f"e2e_{cores}", master=master,
                      shuffle_partitions=cores)
    imgs = build(spark, N)
    n_imgs = N + N // TWIN_EVERY
    t0 = time.time()
    edges = image_dedup_edges(imgs, DedupConfig()).persist()
    by_src = {r["source"]: r["n"] for r in
              edges.groupBy("source").agg(F.count("*").alias("n")).collect()}
    wall = time.time() - t0
    ex = edges.select(
        F.split("a_id", "_").getItem(0).alias("pa"),
        F.split("a_id", "_").getItem(1).alias("na"),
        F.split("b_id", "_").getItem(0).alias("pb"),
        F.split("b_id", "_").getItem(1).alias("nb"),
    )
    twin_side = F.when(F.col("pa") == "o", F.col("pb")).otherwise(
        F.col("pa"))
    hits = (
        ex.filter(
            (F.col("na") == F.col("nb"))
            & (
                ((F.col("pa") == "o")
                 & F.col("pb").isin("re", "mi", "ba"))
                | ((F.col("pb") == "o")
                   & F.col("pa").isin("re", "mi", "ba"))
            )
        )
        .select(twin_side.alias("c"), "na")
        .distinct()
    )
    rec = {r["c"]: r["n"] for r in
           hits.groupBy("c").agg(F.count("*").alias("n")).collect()}
    want = {"re": 0, "mi": 0, "ba": 0}
    for i in range(0, N, TWIN_EVERY):
        want[("re", "mi", "ba")[(i // TWIN_EVERY) % 3]] += 1
    edges.unpersist()
    spark.stop()
    return {
        "cores": cores, "images": n_imgs, "wall_s": round(wall, 2),
        "images_per_s": round(n_imgs / wall, 0), "edges_by_source": by_src,
        "planted_recovered": rec, "planted": want,
        "recall": {k: round(rec.get(k, 0) / want[k], 4) for k in want},
    }


def main():
    r8 = run("local[8]", 8)
    r32 = run("local[32]", 32)
    print(json.dumps({
        "local8": r8, "local32": r32,
        "scaling_x": round(r32["images_per_s"] / r8["images_per_s"], 2),
    }))


if __name__ == "__main__":
    main()
