"""Incremental signature ingest via Structured Streaming.

The reference has no incremental surface (SURVEY.md §1.3) and the north rule
is a batch pipeline with checkpoint/resume — but a 10^12-row corpus is not
re-signed from scratch when new shards land.  This module gives the
signature stage an incremental front door:

    new parquet files in a landing directory
      -> readStream (file source tracks processed files in the stream
         checkpoint — exactly-once per file)
      -> foreachBatch: the SAME fused signature pass used by the batch
         pipeline, appended to the signatures table

Downstream stages (candidate edges, verify, clustering) then run as batch
jobs over the growing signatures table; LSH band keys are per-row, so new
rows only generate candidate pairs against existing band buckets — the
standard incremental-LSH pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

from fuzzymatch_spark.config import DedupConfig
from fuzzymatch_spark.operators.dedup import compute_signatures


def incremental_signatures(
    spark: SparkSession,
    input_dir: str,
    schema: StructType | str,
    output_dir: str,
    checkpoint_dir: str,
    id_col: str,
    text_col: str,
    cfg: DedupConfig | None = None,
    available_now: bool = True,
):
    """Start (and by default drain) a file-source stream that appends
    signature rows for every new input file.

    ``available_now=True`` processes everything currently in ``input_dir``
    and stops — the batch-with-resume mode; ``False`` returns the running
    query for continuous ingest.
    """
    cfg = cfg or DedupConfig()
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 32)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        sig = compute_signatures(batch_df, id_col, text_col, cfg)
        sig.write.mode("append").parquet(output_dir)

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()


def incremental_dedup(
    spark: SparkSession,
    input_dir: str,
    schema: StructType | str,
    work_dir: str,
    checkpoint_dir: str,
    id_col: str,
    text_col: str,
    cfg: DedupConfig | None = None,
    available_now: bool = True,
):
    """Incremental near-duplicate detection: the standard incremental-LSH
    pattern over a file-source stream.

    Per micro-batch of NEW rows:

      1. fused signature pass (same kernel as the batch pipeline)
      2. candidate edges touching >= 1 new row:
           new x new       — the batch band self-join on just the new rows
           new x existing  — new rows' (band, key) equi-joined against the
                             ACCUMULATED bands table (band keys of old rows
                             are stored, never recomputed)
           exact           — hash-join on (xxhash64(norm), len) new vs all
      3. two-tier verify (same verify_edges), APPEND to the edges table
      4. append new signatures + new band keys to their tables

    Each batch touches O(|new| * bands) band rows plus matching buckets —
    history is never rescanned.  Clustering stays a batch job over the
    accumulated edges table (connected components is global by nature; the
    north-rule pipeline runs it from the edges checkpoint).

    Exactly-once per input file via the stream checkpoint, like
    ``incremental_signatures``.  Tables under ``work_dir``:
    ``signatures/``, ``bands/``, ``edges/``.
    """
    import os

    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.dedup import (
        exact_dup_edges,
        minhash_band_edges,
        minhash_bands,
        verify_edges,
    )

    cfg = cfg or DedupConfig()
    sig_dir = os.path.join(work_dir, "signatures")
    bands_dir = os.path.join(work_dir, "bands")
    edges_dir = os.path.join(work_dir, "edges")

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 32)
        .parquet(input_dir)
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        new_sig = compute_signatures(batch_df, id_col, text_col, cfg).persist()
        new_bands = minhash_bands(new_sig, cfg).persist()

        have_history = os.path.exists(os.path.join(sig_dir, "_SUCCESS"))
        cand = minhash_band_edges(new_sig, cfg).select("a_id", "b_id", "source")
        if have_history:
            old_sig = spark.read.parquet(sig_dir)
            old_bands = spark.read.parquet(bands_dir)
            cross = (
                new_bands.alias("n")
                .join(old_bands.alias("o"), on=["band", "key"])
                .filter(F.col("n.id") != F.col("o.id"))
                .select(
                    F.least("n.id", "o.id").alias("a_id"),
                    F.greatest("n.id", "o.id").alias("b_id"),
                )
                .dropDuplicates(["a_id", "b_id"])
                .withColumn("source", F.lit("minhash"))
            )
            keyed_new = new_sig.select(
                "id", F.xxhash64("caption_norm").alias("nh"),
                F.length("caption_norm").alias("nlen"),
            )
            keyed_old = old_sig.select(
                "id", F.xxhash64("caption_norm").alias("nh"),
                F.length("caption_norm").alias("nlen"),
            )
            exact_cross = (
                keyed_new.alias("n")
                .join(keyed_old.alias("o"), on=["nh", "nlen"])
                .filter(F.col("n.id") != F.col("o.id"))
                .select(
                    F.least("n.id", "o.id").alias("a_id"),
                    F.greatest("n.id", "o.id").alias("b_id"),
                )
                .withColumn("source", F.lit("exact"))
            )
            cand = cand.unionByName(cross).unionByName(exact_cross)
            all_sig = old_sig.unionByName(new_sig)
        else:
            all_sig = new_sig
        cand = cand.unionByName(
            exact_dup_edges(new_sig).select("a_id", "b_id", "source")
        )
        cand = cand.groupBy("a_id", "b_id").agg(F.min("source").alias("source"))

        verified = verify_edges(cand, all_sig, cfg)
        verified.write.mode("append").parquet(edges_dir)
        new_sig.write.mode("append").parquet(sig_dir)
        new_bands.write.mode("append").parquet(bands_dir)
        new_sig.unpersist()
        new_bands.unpersist()

    writer = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        return q
    return writer.start()
