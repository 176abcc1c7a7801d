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


def _gate(baseline: float) -> float:
    return max(baseline * REL_TOL, baseline + ABS_SLACK)


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
    times["q2_topk_fuzzy"] = _best_of(
        lambda: top_matches(vocab, "token", "straem", k=10,
                            config=MatchConfig()).collect()
    )
    times["q2b_topk_sw"] = _best_of(
        lambda: top_matches(
            docs, "text", "stream batch", k=20,
            config=MatchConfig(algorithm="smithWaterman", min_score=0.1),
        ).collect()
    )
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
    failures = {
        k: (times[k], _gate(base[k]))
        for k in base
        if times[k] > _gate(base[k])
    }
    assert not failures, (
        f"benchmark regression: measured vs gate {failures}; full {times}"
    )
