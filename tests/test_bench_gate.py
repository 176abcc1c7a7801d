"""Benchmark regression gate, mirroring the reference's treatment of
benchmarks as regression tests with explicit tolerance gates
(`Benchmarks/FuzzyMatchBenchmarks/FuzzyMatchBenchmark.swift:312-347`,
±15/25% thresholds).

The kernel-bound headline queries run best-of-3 at the test session's
parallelism against sf0.1 and must stay within ``1.5x`` of the
committed baseline (``BENCH_GATE.json``) — a deliberate 2x slowdown fails.
Re-record after an intentional perf change with::

    SPARK_GRAFT_RECORD_GATE=1 python -m pytest tests/test_bench_gate.py -q
"""

import json
import os
import time

import pytest

from fuzzymatch_spark.config import MatchConfig
from fuzzymatch_spark.operators.topk import top_matches

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GATE_FILE = os.path.join(REPO, "BENCH_GATE.json")
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# The reference gates at +-15/25% on a quiet workstation
# (FuzzyMatchBenchmark.swift:312-347); this VM has bursty hypervisor steal
# (BENCH.md), so the relative gate is 1.5x — still strictly below the 2x
# "deliberate slowdown" bar, with best-of-4 sampling to tame the noise.
REL_TOL = 1.5
ABS_SLACK = 0.3  # absorbs fixed scheduling jitter on sub-second queries


def _gate(baseline: float, steal: float = 1.0) -> float:
    return max(baseline * REL_TOL, baseline + ABS_SLACK) * steal


def _calibration_wall(reps: int = 3) -> float:
    """Best-of-``reps`` wall of a fixed single-thread CPU kernel (the
    bench harness's per-image workload: synth -> encode -> decode ->
    pHash).  Pure compute, no Spark, no I/O — its only variable is how
    fast this host currently runs a busy core, i.e. hypervisor steal.

    Steal bursts on this VM last MINUTES (BENCH.md), so best-of-N
    back-to-back Spark reps can land entirely inside one burst and a
    relative gate against a quiet-day baseline then fails with no engine
    change (observed: the same suite run measured q2 at 2.2s vs the 0.84s
    baseline while isolated re-runs minutes later hit 1.0s).  The
    calibration kernel is measured INTERLEAVED with the gated queries and
    compared to its committed quiet-window baseline; the ratio scales the
    tolerance, so a stolen window relaxes the gate by exactly the
    slowdown the host itself exhibits, while on a quiet host the factor
    is 1.0 and a genuine 2x engine regression still fails."""
    from fuzzymatch_spark.kernels.phash import phash64
    from fuzzymatch_spark.sources.images import (
        decode_image,
        encode_image,
        synth_pixels,
    )

    best = None
    for r in range(reps):
        t0 = time.time()
        for i in range(200):
            px = synth_pixels(f"gatecal{i}")
            phash64(decode_image(encode_image(px, "jpeg", 95)))
        w = time.time() - t0
        best = w if best is None else min(best, w)
    return round(best, 4)


def test_gate_math_catches_2x():
    """The tolerance function itself: a 2x slowdown always fails for every
    query slower than the absolute slack (all gated queries are)."""
    # holds for every baseline slower than 2*ABS_SLACK (gated queries are)
    for base in (0.7, 1.1, 5.0, 20.0):
        assert 2.0 * base > _gate(base), base


def _best_of(fn, reps=4) -> float:
    best = None
    for _ in range(reps):
        t0 = time.time()
        fn()
        w = time.time() - t0
        best = w if best is None else min(best, w)
    return round(best, 3)


def _workload(spark) -> dict[str, float]:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    vocab = (
        docs.select(F.explode(F.split("text", " ")).alias("token"))
        .filter(F.length("token") > 0)
        .distinct()
    )
    # warmup: python workers / codegen
    top_matches(vocab.limit(500), "token", "straem", k=5).collect()
    times = {}
    calib = [_calibration_wall()]
    times["q2_topk_fuzzy"] = _best_of(
        lambda: top_matches(vocab, "token", "straem", k=10,
                            config=MatchConfig()).collect()
    )
    calib.append(_calibration_wall())
    times["q2b_topk_sw"] = _best_of(
        lambda: top_matches(
            docs, "text", "stream batch", k=20,
            config=MatchConfig(algorithm="smithWaterman", min_score=0.1),
        ).collect()
    )
    calib.append(_calibration_wall())
    times["_calibration"] = min(calib)
    return times


@pytest.mark.slow
def test_bench_regression_gate(spark):
    times = _workload(spark)
    if os.environ.get("SPARK_GRAFT_RECORD_GATE") == "1":
        with open(GATE_FILE, "w") as f:
            json.dump(times, f, indent=2)
        pytest.skip(f"gate baseline recorded: {times}")
    if not os.path.exists(GATE_FILE):
        pytest.skip("no committed gate baseline (run with RECORD_GATE=1)")
    base = json.load(open(GATE_FILE))
    # host-speed factor: >1 only when the calibration kernel itself runs
    # slower than its committed quiet-window wall (hypervisor steal)
    steal = 1.0
    if "_calibration" in base:
        steal = max(1.0, times["_calibration"] / base["_calibration"])
    failures = {
        k: (times[k], round(_gate(base[k], steal), 3))
        for k in base
        if not k.startswith("_") and times[k] > _gate(base[k], steal)
    }
    assert not failures, (
        f"benchmark regression: measured vs gate {failures}; "
        f"steal factor {round(steal, 3)}; full {times}"
    )
