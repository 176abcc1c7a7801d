"""Temporal joins Spark lacks natively.

* ``asof_join`` — for each left row, the latest right row with
  ``right.ts <= left.ts`` per key (the standard "state as of event time"
  join: prices, rates, config versions).  Spark has no ASOF JOIN; the
  naive encoding is a range join (``l.key = r.key AND r.ts <= l.ts`` +
  a per-row max), which explodes to |L|x|R per key| intermediate rows.

  The scalable encoding here is union + carry-forward window:

      tag right rows as state(0) / left rows as event(1)
      -> union on (key, ts, tag)
      -> window per key ordered by (ts, tag):
         last(state_payload, ignorenulls=True) carries the newest
         state at-or-before each event
      -> keep event rows

  ONE shuffle on the key, state size O(1) per row in the window frame
  scan, no intermediate blow-up at any key cardinality or skew — a hot
  key costs its own row count, never a cross product.  State rows sort
  BEFORE events at the same timestamp (tag 0 < 1), giving inclusive
  ``<=`` semantics, matching DuckDB's ``ASOF JOIN ... ON l.ts >= r.ts``
  (the oracle for the driver entry).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    payload_cols: list[str],
) -> DataFrame:
    """Left as-of join: every ``left`` row, plus the ``payload_cols`` of
    the newest ``right`` row with the same keys and ``ts <= left.ts``
    (null-filled when no prior state exists).

    ``right`` must be unique per (key, ts) — duplicate state rows at one
    instant are ambiguous in any as-of semantics; deduplicate upstream.
    """
    payload = F.struct(*[F.col(c) for c in payload_cols])
    ev = left.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(1).alias("_tag"),
        F.struct(*[F.col(c) for c in left.columns]).alias("_row"),
        F.lit(None).cast(
            right.select(payload.alias("p")).schema["p"].dataType
        ).alias("_state"),
    )
    st = right.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        F.lit(0).alias("_tag"),
        F.lit(None).cast(ev.schema["_row"].dataType).alias("_row"),
        payload.alias("_state"),
    )
    w = (
        Window.partitionBy(*key_cols)
        .orderBy("_ts", "_tag")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        ev.unionByName(st)
        .withColumn("_asof", F.last("_state", ignorenulls=True).over(w))
        .filter(F.col("_tag") == 1)
    )
    out_cols = [F.col(f"_row.{c}").alias(c) for c in left.columns]
    out_cols += [F.col(f"_asof.{c}").alias(f"asof_{c}") for c in payload_cols]
    return carried.select(*out_cols)


def range_join(
    left: DataFrame,
    right: DataFrame,
    key_cols: list[str],
    ts_col: str,
    start_col: str,
    end_col: str,
    bucket_secs: int = 300,
) -> DataFrame:
    """Interval containment join: every ``left`` row paired with every
    ``right`` interval ``[start, end)`` (same keys) containing its
    timestamp — the other classic join Spark lacks a native operator
    for (its fallback plan is BroadcastNestedLoopJoin or a per-key cross
    product).

    Scalable encoding — bucketize time:

        right intervals explode into the epoch buckets they overlap
        (``sequence(floor(start/w), floor((end-1)/w))``, in-task);
        left rows land in exactly ONE bucket; the join is an equi-join
        on (keys..., bucket) followed by the exact containment filter.

    A point falls in one bucket, so no dedup pass is needed; candidate
    volume is |intervals| x ceil(span/w) + |points|, never |L| x |R|
    per key.  Pick ``bucket_secs`` near the typical interval length:
    shorter buckets cut false candidates, longer buckets cut the
    explode factor (the standard tuning trade, documented not hidden).

    Keeps all left columns plus the right payload columns (everything in
    ``right`` beyond keys/start/end).
    """
    w = int(bucket_secs)
    if w <= 0:
        raise ValueError("bucket_secs must be positive")
    # bucket on MICROSECOND epochs: unix_timestamp truncates to whole
    # seconds, and truncating the exclusive end before the `-1` would
    # drop the interval's final bucket for sub-second end timestamps
    # (e.g. end 00:10:00.4 with w=300 covers bucket 2, but trunc(600)-1
    # stops at bucket 1 and the join silently loses matches)
    wus = w * 1_000_000

    def _us(c):
        # unix_micros rejects TIMESTAMP_NTZ (the parquet default); the
        # cast is a no-op for TIMESTAMP and pins NTZ to the session zone
        return F.unix_micros(F.col(c).cast("timestamp"))

    lb = F.floor(_us(ts_col) / wus)
    payload_cols = [
        c for c in right.columns
        if c not in set(key_cols) | {start_col, end_col}
    ]
    r = right.filter(F.col(end_col) > F.col(start_col)).select(
        *key_cols,
        F.col(start_col),
        F.col(end_col),
        *payload_cols,
        F.explode(
            F.sequence(
                F.floor(_us(start_col) / wus),
                F.floor((_us(end_col) - 1) / wus),
            )
        ).alias("_bucket"),
    )
    out = (
        left.withColumn("_bucket", lb)
        .join(r, [*key_cols, "_bucket"])
        .filter(
            (F.col(ts_col) >= F.col(start_col))
            & (F.col(ts_col) < F.col(end_col))
        )
    )
    return out.select(*left.columns, start_col, end_col, *payload_cols)
