"""Watermarked windowed aggregation and explicit-state streaming operators:

* append-mode finality — a window is emitted once, only after the
  watermark passes its end, and the emitted values match the batch
  aggregation over the same events
* late-data drop — an event older than the watermark does not reopen or
  change an already-final window
* stateful running totals — GroupState accumulates across separate
  AvailableNow passes through the stream checkpoint
"""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.streaming.windowed import (
    run_user_totals,
    run_windowed_events,
    windowed_event_stats,
)

SCHEMA = "ts timestamp, user_id bigint, event_type string, value double"


def _ts(minute, second=0):
    return datetime(2026, 1, 1, 10, minute, second)


def _write(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def _read_out(spark, out):
    return {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    }


def test_windowed_append_matches_batch_and_drops_late(spark, tmp_path):
    inp = str(tmp_path / "landing")
    out = str(tmp_path / "agg")
    ckpt = str(tmp_path / "ckpt")

    batch1 = [
        (_ts(0, 10), 1, "view", 1.0),
        (_ts(0, 40), 2, "view", 2.0),
        (_ts(0, 50), 1, "click", 0.5),
        (_ts(1, 20), 3, "view", 4.0),
        (_ts(3, 0), 1, "view", 8.0),
    ]
    _write(spark, inp, batch1)
    run_windowed_events(spark, inp, SCHEMA, out, ckpt,
                        window_dur="1 minute", watermark="2 minutes")
    # watermark after batch1 = 10:03 - 2min = 10:01 -> only the 10:00
    # window is final
    got = _read_out(spark, out)
    assert set(k[0].minute for k in got) == {0}
    assert got[(_ts(0), "view")] == (2, 3.0)
    assert got[(_ts(0), "click")] == (1, 0.5)

    # a far-future sentinel advances the watermark past every open window
    _write(spark, inp, [(_ts(30), 9, "view", 0.0)])
    run_windowed_events(spark, inp, SCHEMA, out, ckpt,
                        window_dur="1 minute", watermark="2 minutes")
    got = _read_out(spark, out)
    assert got[(_ts(1), "view")] == (1, 4.0)
    assert got[(_ts(3), "view")] == (1, 8.0)

    # emitted finals match the batch aggregation over the same events
    batch_df = spark.createDataFrame(
        batch1, SCHEMA
    )
    want = {
        (r["win_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_event_stats(batch_df).collect()
    }
    assert {k: v for k, v in got.items() if k[0].minute != 30} == want

    # an event 28 minutes older than the watermark must be dropped: the
    # already-final 10:00 view window stays (2, 3.0)
    _write(spark, inp, [(_ts(0, 55), 7, "view", 100.0)])
    run_windowed_events(spark, inp, SCHEMA, out, ckpt,
                        window_dur="1 minute", watermark="2 minutes")
    got = _read_out(spark, out)
    assert got[(_ts(0), "view")] == (2, 3.0)


def test_running_user_totals_state_across_passes(spark, tmp_path):
    inp = str(tmp_path / "landing")
    out = str(tmp_path / "totals")
    ckpt = str(tmp_path / "ckpt")

    def latest():
        # newest emitted row per user (AvailableNow may split files into
        # several epochs; the running total is whatever came last)
        rows = spark.read.parquet(out).collect()
        best = {}
        for r in rows:
            if r["user_id"] not in best or r["epoch"] > best[r["user_id"]]["epoch"]:
                best[r["user_id"]] = r
        return {u: (r["n_events"], r["total_value"]) for u, r in best.items()}

    _write(spark, inp, [
        (_ts(0), 1, "view", 1.0),
        (_ts(1), 1, "view", 2.0),
        (_ts(1), 2, "click", 5.0),
    ])
    run_user_totals(spark, inp, SCHEMA, out, ckpt)
    assert latest() == {1: (2, 3.0), 2: (1, 5.0)}

    # second pass: state persists through the checkpoint — totals
    # accumulate, they don't restart
    _write(spark, inp, [
        (_ts(2), 1, "view", 4.0),
        (_ts(2), 3, "view", 7.0),
    ])
    run_user_totals(spark, inp, SCHEMA, out, ckpt)
    got2 = latest()
    assert got2[1] == (3, 7.0)   # 2 prior events + 1 new
    assert got2[3] == (1, 7.0)   # new user
    # user 2 had no new events: update mode re-emitted nothing, so their
    # newest row is still the first pass's total
    assert got2[2] == (1, 5.0)


def test_session_windows_batch_golden(spark):
    from fuzzymatch_spark.streaming.windowed import session_window_stats

    events = spark.createDataFrame(
        [
            # user 1: two events 10 min apart (one session with gap 30m),
            # then one event 2h later (second session)
            (_ts(0), 1, "view", 1.0),
            (_ts(10), 1, "view", 2.0),
            (datetime(2026, 1, 1, 12, 0), 1, "view", 4.0),
            # user 2: single event
            (_ts(5), 2, "click", 8.0),
        ],
        SCHEMA,
    )
    rows = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in session_window_stats(events, gap="30 minutes").collect()
    )
    assert rows == [
        (1, _ts(0), 2, 3.0),
        (1, datetime(2026, 1, 1, 12, 0), 1, 4.0),
        (2, _ts(5), 1, 8.0),
    ]
    # session end = last event + gap
    ends = {(r["user_id"], r["session_start"]): r["session_end"]
            for r in session_window_stats(events, gap="30 minutes").collect()}
    assert ends[(1, _ts(0))] == _ts(40)


def test_session_windows_streaming_matches_batch(spark, tmp_path):
    from pyspark.sql import functions as F

    from fuzzymatch_spark.streaming.windowed import session_window_stats

    inp = str(tmp_path / "landing")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    batch = [
        (_ts(0), 1, "view", 1.0),
        (_ts(10), 1, "view", 2.0),
        (_ts(3), 2, "click", 8.0),
    ]
    _write(spark, inp, batch)
    # far-future sentinel closes every session once the watermark passes
    _write(spark, inp, [(_ts(59), 9, "view", 0.0)])

    stream = spark.readStream.schema(SCHEMA).parquet(inp)
    agg = session_window_stats(
        stream.withWatermark("ts", "5 minutes"), gap="30 minutes"
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r["user_id"], r["session_start"], r["n_events"], r["sum_value"])
        for r in session_window_stats(
            spark.createDataFrame(batch, SCHEMA), gap="30 minutes"
        ).collect()
    )
    assert got == want  # closed streaming sessions == batch sessions


def test_session_spanning_two_triggers_emits_once_merged(spark, tmp_path):
    """The merge-across-triggers case batch parity can't exercise: a
    session whose events arrive in two separate AvailableNow passes must
    emit exactly one MERGED final row, and only after the watermark
    crosses the session end."""
    from fuzzymatch_spark.streaming.windowed import run_session_windows

    inp = str(tmp_path / "landing")
    out = str(tmp_path / "sessions")
    ckpt = str(tmp_path / "ckpt")

    # pass 1: two events 10 min apart (one open session, gap 30m).
    # watermark after pass 1 = 10:10 - 5m = 10:05 < session end 10:40,
    # so NOTHING may be emitted yet.
    _write(spark, inp, [
        (_ts(0), 1, "view", 1.0),
        (_ts(10), 1, "view", 2.0),
    ])
    run_session_windows(spark, inp, SCHEMA, out, ckpt,
                        gap="30 minutes", watermark="5 minutes")
    import glob
    emitted_p1 = []
    if glob.glob(f"{out}/*.parquet"):
        emitted_p1 = spark.read.parquet(out).collect()
    assert emitted_p1 == [], emitted_p1

    # pass 2: a LATE-ARRIVING extension of the same session (10:20,
    # within the gap of 10:10, still >= the 10:05 watermark so it is not
    # dropped) plus a far-future event that pushes the watermark to
    # 11:55 — past the merged session's end (10:20 + 30m = 10:50).
    _write(spark, inp, [
        (_ts(20), 1, "view", 4.0),
        (datetime(2026, 1, 1, 12, 0), 1, "view", 100.0),
    ])
    run_session_windows(spark, inp, SCHEMA, out, ckpt,
                        gap="30 minutes", watermark="5 minutes")
    rows = spark.read.parquet(out).collect()
    # exactly ONE session row: all three events merged across the two
    # triggers; the 12:00 event's session is still open (not emitted)
    assert len(rows) == 1, rows
    r = rows[0]
    assert r["user_id"] == 1
    assert r["session_start"] == _ts(0)
    assert r["session_end"] == _ts(50)          # last event 10:20 + 30m
    assert r["n_events"] == 3
    assert r["sum_value"] == 7.0
