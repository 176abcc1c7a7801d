#!/usr/bin/env python
"""A/B + scaling probe for the survivor-payload emit path: Bloom-delivered
drop verdict (``survivor_payload_filter``) vs the naive anti-join of the
payload table against the drop ids.

Both variants face the at-scale join regime: ``autoBroadcastJoinThreshold``
is disabled, because at 10^12 rows a percent-level drop set is ~10^10 ids —
never broadcastable — so the naive anti-join sort-merge-joins and every
payload row (bytes included) rides the id exchange.  The Bloom variant's
only implicit-size joins are ids-only (the false-positive recovery); its
one explicit ``broadcast(fp_keep)`` hint survives the disabled threshold
exactly as the operator intends (fp_keep is bounded by fp_rate*survivors;
beyond broadcast budget the documented answer is shard-wise passes, not a
payload shuffle).

Payload rows carry incompressible 512-byte bodies (8 concatenated
sha2-512 digests) so shuffle compression cannot hide the exchanged
volume.  Sink is ``format("noop")`` so the bytes column must flow
end-to-end (a bare count() would let Catalyst prune it from the scan).

Reports min-of-REPS walls per variant at local[8] and local[32], the
bloom-vs-naive speedup at each core count, and the Bloom variant's
scaling efficiency vs the same-host parallel ceiling (bench.py's
kernel).  Run exclusively.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

N = int(os.environ.get("PAYLOAD_N", "2000000"))
REPS = int(os.environ.get("PAYLOAD_REPS", "2"))
# body size in 64-byte sha512 digests: 8 -> 512 B (thumbnail-ish), 64 ->
# 4 KiB (the regime where the naive variant's payload exchange binds)
DIGESTS = int(os.environ.get("PAYLOAD_DIGESTS", "8"))
BASE = os.environ.get(
    "PAYLOAD_DIR", f"/tmp/payload_emit_probe_{DIGESTS * 64}b"
)
PAYLOAD = os.path.join(BASE, "payload")
DROPS = os.path.join(BASE, "drops")


def mk_tables(spark, n: int) -> None:
    body = F.concat(*[
        F.unhex(F.sha2(F.format_string(f"%d_{salt}", F.col("id")), 512))
        for salt in range(DIGESTS)
    ])
    rows = spark.range(n).select(
        F.format_string("img_%09d", F.col("id")).alias("image_id"),
        body.alias("bytes"),
        F.lit(64).alias("w"), F.lit(64).alias("h"),
        F.lit("png").alias("fmt"),
        F.col("id"),
    )
    rows.drop("id").write.mode("overwrite").parquet(PAYLOAD)
    # drop verdict: 25% of ids (a clustering outcome — NOT derivable from
    # the row, which is the whole reason this delivery problem exists)
    rows.filter(F.col("id") % 4 == 0).select("image_id") \
        .write.mode("overwrite").parquet(DROPS)


def run(master: str, cores: int, variant: str) -> dict:
    from fuzzymatch_spark.operators.multimodal import survivor_payload_filter
    from fuzzymatch_spark.session import get_spark

    spark = get_spark(
        app_name=f"payload_emit_{variant}_{cores}", master=master,
        shuffle_partitions=2 * cores,
        extra_conf={"spark.sql.autoBroadcastJoinThreshold": "-1"},
    )
    payload = spark.read.parquet(PAYLOAD)
    drops = spark.read.parquet(DROPS)
    payload.count()  # warm page cache so every draw reads warm
    drops.count()

    walls = []
    survivors = None
    for _ in range(REPS):
        t0 = time.time()
        if variant == "naive":
            out = payload.join(drops, "image_id", "left_anti")
        else:
            out = survivor_payload_filter(payload, drops)
        out.write.mode("overwrite").format("noop").save()
        walls.append(time.time() - t0)
        if survivors is None:
            survivors = out.count()
    spark.stop()
    wall = min(walls)
    return {
        "variant": variant, "cores": cores, "rows": N,
        "body_bytes": DIGESTS * 64,
        "survivors": survivors,
        "walls_s": [round(w, 2) for w in walls],
        "wall_s": round(wall, 2),
        "rows_per_s": round(N / wall, 0),
    }


def main() -> None:
    from bench import hw_ceiling_at
    from fuzzymatch_spark.session import get_spark

    if not os.path.exists(os.path.join(DROPS, "_SUCCESS")):
        spark = get_spark(app_name="payload_emit_mk", master="local[32]",
                          shuffle_partitions=64)
        mk_tables(spark, N)
        spark.stop()

    res = {}
    for cores in (8, 32):
        for variant in ("naive", "bloom"):
            res[(variant, cores)] = run(f"local[{cores}]", cores, variant)

    assert res[("naive", 8)]["survivors"] == res[("bloom", 8)]["survivors"]
    assert res[("naive", 32)]["survivors"] == res[("bloom", 32)]["survivors"]

    c8, c32 = hw_ceiling_at(8), hw_ceiling_at(32)
    ceiling = c8 / c32 if c32 else float("nan")
    sx = res[("bloom", 32)]["rows_per_s"] / res[("bloom", 8)]["rows_per_s"]
    print(json.dumps({
        "local8": {v: res[(v, 8)] for v in ("naive", "bloom")},
        "local32": {v: res[(v, 32)] for v in ("naive", "bloom")},
        "speedup_x_8": round(
            res[("naive", 8)]["wall_s"] / res[("bloom", 8)]["wall_s"], 2),
        "speedup_x_32": round(
            res[("naive", 32)]["wall_s"] / res[("bloom", 32)]["wall_s"], 2),
        "bloom_scaling_x": round(sx, 2),
        "hw_ceiling_x": round(ceiling, 2),
        "efficiency_vs_ceiling": round(sx / ceiling, 3),
    }))


if __name__ == "__main__":
    main()
