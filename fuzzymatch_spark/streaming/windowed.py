"""Watermarked windowed aggregation + custom stateful operators over an
event stream (Structured Streaming).

The reference engine is batch-only (SURVEY.md §1.3); these give the engine
the standard streaming-analytics surface a training-data platform needs
around its ingest path:

* ``windowed_event_stats`` — tumbling-window counts/sums with a watermark.
  In append output mode a window is emitted exactly once, when the
  watermark passes its end: downstream consumers see FINAL window rows
  only, and late events older than the watermark are dropped by the
  engine (bounded state at any scale — state size is
  O(open windows x group keys), never O(events)).
* ``run_windowed_events`` — drives the aggregation from a parquet landing
  directory to a parquet sink with ``Trigger.AvailableNow`` — the same
  synchronous one-shot drive the incremental-LSH ingest uses, so the
  pipeline can be cron-scheduled without a resident cluster.
* ``running_user_totals`` — ``applyInPandasWithState`` custom stateful
  operator: per-user running (n_events, total_value) carried in explicit
  GroupState across triggers.  Arrow-batched like every other Python
  stage in this engine; state per key is two scalars, so a 10^9-user
  stream holds gigabytes, not terabytes, of state.

Scale notes: the windowed aggregation is a streaming hash aggregate — the
shuffle key is (window, event_type), partial aggregation is map-side, and
the state store holds only open windows.  The watermark bounds both state
and out-of-order buffering; pick it from the source's real lateness
distribution (p99.9 event delay), not from wall-clock guesswork.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def windowed_event_stats(
    events: DataFrame,
    window_dur: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    exact_sums: bool = False,
) -> DataFrame:
    """Tumbling-window per-event-type counts and value sums, watermarked.

    Works on a streaming OR batch DataFrame (withWatermark is a no-op in
    batch) — the parity test runs the same plan both ways, and the batch
    form is a driver oracle entry.  ``exact_sums`` routes the value sum
    through decimal(38,6) so the result is summation-order-independent
    (the cross-engine-check path); the streaming path keeps double sums.
    """
    val = (
        F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6)
        if exact_sums
        else F.round(F.sum("value"), 6)
    )
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window_dur), F.col("event_type"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            val.alias("sum_value"),
        )
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def run_windowed_events(
    spark: SparkSession,
    input_dir: str,
    schema: str | StructType,
    out_dir: str,
    checkpoint_dir: str,
    window_dur: str = "1 minute",
    watermark: str = "2 minutes",
) -> None:
    """One synchronous AvailableNow pass: new landing files -> watermarked
    window aggregation -> parquet append (final windows only)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = windowed_event_stats(stream, window_dur, watermark)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    key_col: str = "user_id",
    exact_sums: bool = False,
    watermark: str | None = None,
) -> DataFrame:
    """Per-key session windows (sessions close after ``gap`` of
    inactivity) with count/sum aggregates — ``F.session_window``, which
    runs identically on batch and streaming input (with a watermark, in
    streaming).  Session end is last-event + gap, Spark's definition.

    Batch form doubles as an oracle entry: the DuckDB cross-check uses
    the independent gaps-and-islands formulation (lag + running sum of
    session starts), so agreement pins Spark's merge semantics, not an
    echo of them.  ``exact_sums`` routes the value sum through
    decimal(38,6) for order-independence (the cross-check path).
    """
    val = (
        F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6)
        if exact_sums
        else F.round(F.sum("value"), 6)
    )
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("w"), F.col(key_col)
        )
        .agg(F.count("*").cast("long").alias("n_events"), val.alias("sum_value"))
        .select(
            key_col,
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


def run_session_windows(
    spark: SparkSession,
    input_dir: str,
    schema: str | StructType,
    out_dir: str,
    checkpoint_dir: str,
    gap: str = "30 minutes",
    watermark: str = "5 minutes",
) -> None:
    """One synchronous AvailableNow pass of the SESSION-window
    aggregation: new landing files -> watermarked per-key session merge
    -> parquet append.  In append mode a session is emitted exactly once,
    when the watermark passes its end (last event + gap) — so a session
    whose events arrive across SEPARATE passes stays in the state store,
    merges, and surfaces as one final row only after a later pass moves
    the watermark beyond it.  State is O(open sessions x keys)."""
    stream = spark.readStream.schema(schema).parquet(input_dir)
    agg = session_window_stats(stream, gap=gap, watermark=watermark)
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


_TOTALS_OUT = "user_id long, n_events long, total_value double"
_TOTALS_STATE = "n long, total double"


def _totals_fn(key, pdfs, state: GroupState):
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals as an explicit-state streaming operator
    (``applyInPandasWithState``): each trigger folds the user's new events
    into (n, total) GroupState and emits the updated running row."""
    return events.groupBy("user_id").applyInPandasWithState(
        _totals_fn,
        outputStructType=_TOTALS_OUT,
        stateStructType=_TOTALS_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_user_totals(
    spark: SparkSession,
    input_dir: str,
    schema: str | StructType,
    out_dir: str,
    checkpoint_dir: str,
) -> None:
    """One AvailableNow pass of the stateful totals, appended to parquet
    with the epoch id (foreachBatch — the memory sink cannot recover from
    a checkpoint, parquet-with-epoch can).  State carries across passes
    via the stream checkpoint; the latest epoch per user is the current
    running total."""
    stream = spark.readStream.schema(schema).parquet(input_dir)

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.withColumn("epoch", F.lit(batch_id)).write.mode(
            "append"
        ).parquet(out_dir)

    q = (
        running_user_totals(stream)
        .writeStream.outputMode("update")
        .foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
