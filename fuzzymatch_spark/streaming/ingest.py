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
