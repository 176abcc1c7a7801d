#!/usr/bin/env python
"""Round-7 optimization instrumentation (guide §1): per-stage decomposition
of every bench query with noop-sink isolation + job labels, and
``--plans`` capture of .explain('formatted') into plans/r07/.

NOT the graded bench — bench.py stays frozen.  Run exclusively (no other
Spark work on the host); numbers land on stdout as one JSON line.

Usage:
  python bench_extra.py                 # stage timings, 2 passes
  python bench_extra.py --plans before  # also write plans/r07/*_before.txt
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
PASSES = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2"))


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    plans_tag = None
    if "--plans" in sys.argv:
        plans_tag = sys.argv[sys.argv.index("--plans") + 1]

    from pyspark.sql import functions as F

    from fuzzymatch_spark.config import DedupConfig, MatchConfig
    from fuzzymatch_spark.operators.ann import cosine_topk
    from fuzzymatch_spark.operators.cluster import cluster_assignments
    from fuzzymatch_spark.operators.dedup import (
        candidate_edges,
        compute_signatures,
        phash_band_edges,
        verify_edges,
    )
    from fuzzymatch_spark.operators.topk import top_matches
    from fuzzymatch_spark.session import get_spark
    from fuzzymatch_spark.sources.images import build_images_df, build_phash_df

    spark = get_spark(app_name="bench-extra-r07", master=f"local[{CPUS}]")
    sc = spark.sparkContext

    cfg = DedupConfig.web_dense()
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    times: dict[str, list[float]] = {}

    def timed(name, fn):
        sc.setJobDescription(name)
        t0 = time.time()
        out = fn()
        times.setdefault(name, []).append(round(time.time() - t0, 3))
        sc.setJobDescription(None)
        return out

    def write_plan(name, df):
        if plans_tag is None:
            return
        os.makedirs("plans/r07", exist_ok=True)
        with open(f"plans/r07/{name}_{plans_tag}.txt", "w") as f:
            f.write(df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted")))

    # warmup (same as bench.py)
    compute_signatures(docs.limit(200), "doc_id", "text", cfg).count()

    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )

    for p in range(PASSES):
        # ---- q1 staged ----
        sig = compute_signatures(docs, "doc_id", "text", cfg)
        timed("q1a_signatures_noop", lambda: noop(sig))
        sigp = compute_signatures(docs, "doc_id", "text", cfg).persist()
        timed("q1a_signatures_persist_count", sigp.count)
        cand = candidate_edges(sigp, cfg)
        timed("q1b_candidates_noop", lambda: noop(cand))
        verified = verify_edges(cand, sigp, cfg)
        timed("q1c_verify_noop", lambda: noop(verified))
        # full q1 shape for the CC residual: lazy verify -> fold CC
        verified2 = verify_edges(candidate_edges(sigp, cfg), sigp, cfg)
        clusters = cluster_assignments(
            verified2, sigp.select(F.col("id")), id_col="id"
        )
        timed(
            "q1d_cc_plus_verify",
            lambda: clusters.select("cluster_id").distinct().count(),
        )
        if p == 0:
            write_plan("q1_candidates", cand)
            write_plan("q1_verify", verified)
        sigp.unpersist()

        # ---- q2 / q2b ----
        q2df = top_matches(vocab, "token", "straem", k=10, config=MatchConfig())
        timed("q2_topk_fuzzy", q2df.collect)
        q2bdf = top_matches(
            docs, "text", "stream batch", k=20,
            config=MatchConfig(algorithm="smithWaterman", min_score=0.1),
        )
        timed("q2b_topk_sw", q2bdf.collect)
        if p == 0:
            write_plan("q2_topk_fuzzy", q2df)
            write_plan("q2b_topk_sw", q2bdf)

        # ---- q3 staged ----
        images = build_images_df(spark, docs, "doc_id", "text")
        timed("q3a_build_images_noop", lambda: noop(images))
        timed(
            "q3a_build_phash_noop",
            lambda: noop(build_phash_df(spark, docs, "doc_id", "text")),
        )
        edges3 = phash_band_edges(build_images_df(spark, docs, "doc_id", "text"), cfg)
        timed("q3_full_count", edges3.count)
        if p == 0:
            write_plan("q3_phash_edges", edges3)

        # ---- q4 ----
        def q4():
            qv = [float(x) for x in
                  emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
            return cosine_topk(emb, "embedding", qv, k=10).collect()
        timed("q4_ann_cosine", q4)
        if p == 0:
            qv = [float(x) for x in
                  emb.filter(F.col("vec_id") == 0).select("embedding").first()[0]]
            write_plan("q4_ann_cosine", cosine_topk(emb, "embedding", qv, k=10))

        # ---- q5 ----
        q5df = (
            li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00")
                      .cast("timestamp_ntz"))
            .groupBy("l_returnflag", "l_linestatus")
            .agg(F.sum("l_quantity"), F.sum("l_extendedprice"), F.count("*"))
        )
        timed("q5_tpch_q1", q5df.collect)
        if p == 0:
            write_plan("q5_tpch_q1", q5df)

    mins = {k: min(v) for k, v in times.items()}
    print(json.dumps({"sf": SF_DIR, "cpus": CPUS, "mins": mins,
                      "samples": times}))
    spark.stop()


if __name__ == "__main__":
    main()
