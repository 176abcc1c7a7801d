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
