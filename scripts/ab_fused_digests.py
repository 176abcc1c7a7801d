#!/usr/bin/env python
"""A/B: fused one-decode digest UDF (`make_image_digests_udf`) vs the
three separate digest UDF passes (phash + canonical + tiles) over the
same encoded images — min-of-3 reps each, noop sink.  Run exclusively.

Recorded result (20k mixed png/jpeg rows, local[8]): separate 9.68 s ->
fused 6.54 s, 1.48x — less than the decode multiple alone because the
canonical hash's 8 DCT passes are a real share of the per-image cost.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N = int(os.environ.get("AB_N", "20000"))
REPS = int(os.environ.get("AB_REPS", "3"))


def main():
    import pandas as pd

    from fuzzymatch_spark.session import get_spark
    from fuzzymatch_spark.sources.images import (
        encode_image,
        make_canonical_phash_udf,
        make_image_digests_udf,
        make_phash_udf,
        make_tile_phash_udf,
        synth_pixels,
    )

    spark = get_spark(app_name="ab_fused", master="local[8]",
                      shuffle_partitions=8)

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].astype(str)
            yield pd.DataFrame({
                "image_id": ids,
                "bytes": [
                    encode_image(
                        synth_pixels(f"i{j}"),
                        "jpeg" if int(j) % 2 else "png", quality=95,
                    )
                    for j in ids
                ],
            })

    imgs = (
        spark.range(N).mapInPandas(gen, "image_id string, bytes binary")
        .repartition(8).persist()
    )
    imgs.count()

    variants = {
        "separate": lambda d: d.select(
            make_phash_udf()("bytes").alias("p"),
            make_canonical_phash_udf()("bytes").alias("c"),
            make_tile_phash_udf(3)("bytes").alias("t"),
        ),
        "fused": lambda d: d.select(
            make_image_digests_udf(3)("bytes").alias("d")
        ),
    }
    walls = {}
    for name, expr in variants.items():
        ws = []
        for _ in range(REPS):
            t0 = time.time()
            expr(imgs).write.mode("overwrite").format("noop").save()
            ws.append(round(time.time() - t0, 2))
        walls[name] = min(ws)
        print(name, ws)
    print(f"n={N} separate={walls['separate']:.2f}s "
          f"fused={walls['fused']:.2f}s "
          f"speedup={walls['separate'] / walls['fused']:.2f}x")
    spark.stop()


if __name__ == "__main__":
    main()
