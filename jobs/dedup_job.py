#!/usr/bin/env python
"""spark-submit entrypoint for the near-duplicate pipeline (north rule:
`spark-submit --py-files dist/fuzzymatch_spark.zip jobs/dedup_job.py ...`).

On a cluster the session comes from spark-submit (master/executors from the
submit conf); the job only supplies SQL-level settings.  Resume is automatic:
re-submitting with the same --work-dir skips completed stages.

Example:
    scripts/package.sh
    spark-submit --master 'local[8]' \
        --py-files dist/fuzzymatch_spark.zip \
        jobs/dedup_job.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --id-col doc_id --text-col text \
        --work-dir /tmp/dedup_run1 --profile web_dense
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="input parquet path")
    ap.add_argument("--id-col", default="image_id")
    ap.add_argument("--text-col", default="caption")
    ap.add_argument("--phash-col", default=None)
    ap.add_argument("--cphash-col", default=None,
                    help="stored dihedral-canonical pHash column: adds the"
                         " flip/rotation-resistant 'mirror' edge source")
    ap.add_argument("--apply-gate", action="store_true",
                    help="stage 0: metadata keep/reject + aspect buckets"
                         " (needs w/h/fmt columns); rejects never reach"
                         " the signature codecs")
    ap.add_argument("--select-canonical", action="store_true",
                    help="stage 4b: flag each cluster's max-pixels"
                         " survivor (needs w/h columns)")
    ap.add_argument("--emit-batches", type=int, default=None,
                    help="stage 4c: write the training manifest — "
                         "canonical survivors with (bucket, shard, "
                         "batch_idx) at this batch size (requires "
                         "--apply-gate and --select-canonical)")
    ap.add_argument("--batch-shards", type=int, default=1024)
    ap.add_argument("--emit-resized", action="store_true",
                    help="stage 4d: write canonical survivors' payloads "
                         "resized to their aspect bucket's dims (lossless "
                         "PNG), partitioned by (w, h); needs a bytes "
                         "column (requires --apply-gate and "
                         "--select-canonical)")
    ap.add_argument("--aspect-ladder", default=None,
                    help="comma-separated WxH bucket ladder (e.g. "
                         "'512x2048,1024x1024,2048x512') driving BOTH the "
                         "gate buckets and the resize targets; default: "
                         "the built-in 17-rung ladder")
    ap.add_argument("--decontaminate-bench", default=None,
                    help="stage 1b: parquet path of benchmark image "
                         "hashes (bench_id, <phash-col>); corpus rows "
                         "within --decon-max-hamming of any benchmark "
                         "hash are checkpointed as lineage and excluded "
                         "from clustering and every emit stage "
                         "(requires --phash-col)")
    ap.add_argument("--decon-max-hamming", type=int, default=6)
    ap.add_argument("--work-dir", required=True)
    ap.add_argument("--profile", default="default",
                    choices=["default", "web_dense"])
    ap.add_argument("--config-json", default=None,
                    help="full DedupConfig as JSON (overrides --profile)")
    args = ap.parse_args()

    # imports deferred until after spark-submit ships the --py-files zip
    from fuzzymatch_spark.config import DedupConfig
    from fuzzymatch_spark.plans.pipeline import DedupPipeline

    spark = (
        SparkSession.builder.appName("fuzzymatch-dedup")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )

    if args.config_json:
        cfg_kwargs = json.loads(args.config_json)
        cfg = DedupConfig(**cfg_kwargs)
    elif args.profile == "web_dense":
        cfg = DedupConfig.web_dense()
    else:
        cfg = DedupConfig()

    df = spark.read.parquet(args.input)
    pipe = DedupPipeline(
        spark,
        args.work_dir,
        cfg,
        id_col=args.id_col,
        text_col=args.text_col,
        phash_col=args.phash_col,
        cphash_col=args.cphash_col,
        apply_gate=args.apply_gate,
        select_canonical=args.select_canonical,
        emit_batches=args.emit_batches,
        batch_shards=args.batch_shards,
        emit_resized=args.emit_resized,
        aspect_ladder=(
            tuple(
                tuple(int(d) for d in rung.split("x"))
                for rung in args.aspect_ladder.split(",")
            )
            if args.aspect_ladder else None
        ),
        decontaminate_bench=args.decontaminate_bench,
        decon_max_hamming=args.decon_max_hamming,
    )
    clusters = pipe.run(df)
    n_rows = clusters.count()
    n_clusters = clusters.select("cluster_id").distinct().count()
    print(json.dumps({
        "rows": n_rows,
        "clusters": n_clusters,
        "stages": pipe.metrics,
        "work_dir": args.work_dir,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
