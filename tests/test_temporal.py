"""As-of join semantics: inclusive <=, null before the first state row,
per-key isolation, and exactly one output row per left row regardless of
how many state rows precede it (the property the naive range-join
encoding breaks)."""

from datetime import datetime

from pyspark.sql import functions as F

from fuzzymatch_spark.operators.temporal import asof_join


def _t(m):
    return datetime(2026, 1, 1, 10, m)


def test_asof_join_golden(spark):
    left = spark.createDataFrame(
        [
            (1, "u1", _t(0)),   # before any state -> null
            (2, "u1", _t(5)),   # exactly at state ts -> inclusive match
            (3, "u1", _t(7)),   # between states -> rate 10
            (4, "u1", _t(20)),  # after both -> rate 20
            (5, "u2", _t(30)),  # other key: only u2 state applies
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("u1", _t(5), 10.0),
            ("u1", _t(10), 20.0),
            ("u2", _t(1), 99.0),
        ],
        "user_id string, ts timestamp, rate double",
    )
    out = asof_join(left, right, ["user_id"], "ts", ["rate"])
    got = {r["event_id"]: r["asof_rate"] for r in out.collect()}
    assert got == {1: None, 2: 10.0, 3: 10.0, 4: 20.0, 5: 99.0}
    assert out.count() == left.count()  # exactly one row per left row


def test_asof_join_one_row_per_event_under_many_states(spark):
    left = spark.createDataFrame(
        [(1, "k", _t(59))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _t(m), float(m)) for m in range(50)],
        "user_id string, ts timestamp, rate double",
    )
    rows = asof_join(left, right, ["user_id"], "ts", ["rate"]).collect()
    assert len(rows) == 1
    assert rows[0]["asof_rate"] == 49.0  # newest prior state wins


def test_asof_join_single_shuffle_plan(spark):
    left = spark.createDataFrame(
        [(1, "k", _t(1))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _t(0), 1.0)], "user_id string, ts timestamp, rate double"
    )
    plan = (
        asof_join(left, right, ["user_id"], "ts", ["rate"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    # union + one window: a single exchange on the key, and no join node
    # at all (the naive ASOF encoding is a range join that explodes)
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan


# ------------------------------------------------------------- range join

def test_range_join_golden_boundaries(spark):
    from fuzzymatch_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [
            (1, "k", _t(0)),    # == start -> included
            (2, "k", _t(9)),    # inside
            (3, "k", _t(10)),   # == end -> excluded
            (4, "k", _t(59)),   # outside everything
            (5, "x", _t(5)),    # other key, no intervals
        ],
        "event_id long, user_id string, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            ("k", _t(0), _t(10), 100),
            ("k", _t(5), _t(15), 200),  # overlaps the first
        ],
        "user_id string, start_ts timestamp, end_ts timestamp, iv long",
    )
    out = range_join(left, right, ["user_id"], "ts",
                     "start_ts", "end_ts", bucket_secs=180)
    got = sorted((r["event_id"], r["iv"]) for r in out.collect())
    assert got == [(1, 100), (2, 100), (2, 200), (3, 200)]


def test_range_join_matches_bruteforce(spark):
    # fixed-seed random intervals vs the naive inequality join
    import random

    from fuzzymatch_spark.operators.temporal import range_join

    def tm(m):  # minute count with hour carry (intervals can pass :60)
        return datetime(2026, 1, 1, 10 + m // 60, m % 60)

    rng = random.Random(13)
    left_rows = [
        (i, f"u{rng.randrange(4)}", tm(rng.randrange(60)))
        for i in range(200)
    ]
    right_rows = [
        ("u%d" % rng.randrange(4), tm(s), tm(s + rng.randrange(1, 20)), i)
        for i, s in ((j, rng.randrange(55)) for j in range(40))
    ]
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        right_rows,
        "user_id string, start_ts timestamp, end_ts timestamp, iv long",
    )
    got = sorted(
        (r["event_id"], r["iv"])
        for r in range_join(left, right, ["user_id"], "ts",
                            "start_ts", "end_ts", bucket_secs=240).collect()
    )
    want = sorted(
        (r["event_id"], r["iv"])
        for r in left.join(
            right,
            (left.user_id == right.user_id)
            & (left.ts >= right.start_ts) & (left.ts < right.end_ts),
        ).collect()
    )
    assert got == want and len(got) > 0


def test_range_join_plan_is_equi_join(spark):
    from fuzzymatch_spark.operators.temporal import range_join

    left = spark.createDataFrame(
        [(1, "k", _t(1))], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _t(0), _t(5), 9)],
        "user_id string, start_ts timestamp, end_ts timestamp, iv long",
    )
    plan = (
        range_join(left, right, ["user_id"], "ts", "start_ts", "end_ts")
        ._jdf.queryExecution().executedPlan().toString()
    )
    # bucketized: a hash equi-join on (key, bucket), never a nested-loop
    # or cartesian fallback
    assert "NestedLoop" not in plan and "Cartesian" not in plan, plan


def test_range_join_subsecond_end_not_truncated(spark):
    # regression: unix_timestamp truncation used to drop the interval's
    # final bucket when end had sub-second precision
    from datetime import timedelta

    from fuzzymatch_spark.operators.temporal import range_join

    end = _t(10) + timedelta(milliseconds=400)
    ev_ts = _t(10) + timedelta(milliseconds=200)
    left = spark.createDataFrame(
        [(1, "k", ev_ts)], "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        [("k", _t(0), end, 7)],
        "user_id string, start_ts timestamp, end_ts timestamp, iv long",
    )
    rows = range_join(left, right, ["user_id"], "ts",
                      "start_ts", "end_ts", bucket_secs=300).collect()
    assert [(r["event_id"], r["iv"]) for r in rows] == [(1, 7)]


def test_asof_join_matches_bruteforce(spark):
    # fixed-seed randomized parity vs the naive
    # join-then-max-prior-state reference
    import random

    rng = random.Random(7)
    left_rows = [
        (i, f"u{rng.randrange(5)}", _t(rng.randrange(60)))
        for i in range(150)
    ]
    right_rows = [
        (f"u{rng.randrange(5)}", _t(rng.randrange(60)), float(i))
        for i in range(60)
    ]
    # as-of requires unique (key, ts) on the right
    seen = set()
    right_rows = [r for r in right_rows
                  if (r[0], r[1]) not in seen and not seen.add((r[0], r[1]))]
    left = spark.createDataFrame(
        left_rows, "event_id long, user_id string, ts timestamp"
    )
    right = spark.createDataFrame(
        right_rows, "user_id string, ts timestamp, rate double"
    )
    got = {r["event_id"]: r["asof_rate"]
           for r in asof_join(left, right, ["user_id"], "ts", ["rate"]).collect()}
    by_key = {}
    for k, ts, v in right_rows:
        by_key.setdefault(k, []).append((ts, v))
    for i, k, ts in left_rows:
        prior = [(t, v) for t, v in by_key.get(k, []) if t <= ts]
        want = max(prior)[1] if prior else None
        assert got[i] == want, (i, k, ts)
