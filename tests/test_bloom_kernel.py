"""Direct tests of the shared column-expression Bloom kernel
(`functions/bloom.py`) — two operators (`survivor_payload_filter`,
`decontaminate_ngrams_bloom`) build with one call and probe with
another, so the build/probe addressing contract deserves its own pin
beyond the caller-level tests.

The kernel's correctness obligations:
  * ZERO false negatives — every key folded into the filter must probe
    True, for any (n_bits, k), including pathological undersizing.
  * The probe's byte addressing must agree with the build's
    little-endian word packing (a mismatch would not fail loudly; it
    would just degrade both directions silently).
  * The filter must discriminate — non-members mostly probe False at a
    sane bits-per-key (false positives are allowed, that is what the
    operators' recovery joins are for).
"""

import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
    bloom_positions,
)


def _probe_ids(spark, bf, ids, n_bits, k):
    df = spark.createDataFrame([(i,) for i in ids], "key string")
    rows = df.select(
        "key", bloom_might_contain(bf, F.col("key"), n_bits, k).alias("hit")
    ).collect()
    return {r["key"]: r["hit"] for r in rows}


@pytest.mark.parametrize("bits_per_key", [1, 4, 10])
def test_no_false_negatives_any_sizing(spark, bits_per_key):
    """Every inserted key probes True even when the filter is
    deliberately undersized (bits_per_key=1 saturates most of the bit
    array — still no false negative is tolerable)."""
    members = [f"key_{i}" for i in range(500)]
    keys = spark.createDataFrame([(m,) for m in members], "key string")
    n_bits, k = bloom_params(len(members), bits_per_key)
    bf = bloom_build(keys, F.col("key"), n_bits, k)
    assert len(bf) == ((n_bits + 63) // 64) * 8
    hits = _probe_ids(spark, bf, members, n_bits, k)
    missed = [m for m, h in hits.items() if not h]
    assert missed == [], f"false negatives: {missed[:5]}"


def test_discrimination_at_matched_k(spark):
    """Non-members mostly probe False at 10 bits/key (~0.8% fp rate);
    a wholesale-True filter would mean broken addressing, not chance."""
    members = [f"m_{i}" for i in range(2000)]
    others = [f"x_{i}" for i in range(2000)]
    keys = spark.createDataFrame([(m,) for m in members], "key string")
    n_bits, k = bloom_params(len(members), 10)
    bf = bloom_build(keys, F.col("key"), n_bits, k)
    hits = _probe_ids(spark, bf, others, n_bits, k)
    fp = sum(1 for h in hits.values() if h)
    # expected ~16 of 2000; 200 (10%) means the addressing is broken
    assert fp < 200, f"fp rate {fp/2000:.3f} far above the 0.6185**10 design"


def test_probe_addressing_matches_build_packing(spark):
    """Cross-check the probe's byte extraction against a pure-Python
    reimplementation of the build's little-endian packing, using the
    kernel's own probe positions — pins the byte order so neither side
    can drift without this failing."""
    members = [f"p_{i}" for i in range(64)]
    keys = spark.createDataFrame([(m,) for m in members], "key string")
    n_bits, k = 4096, 3
    bf = bloom_build(keys, F.col("key"), n_bits, k)

    pos_rows = (
        keys.select(
            F.array(*bloom_positions(F.col("key"), n_bits, k)).alias("pos")
        ).collect()
    )
    expect = bytearray(len(bf))
    for r in pos_rows:
        for p in r["pos"]:
            expect[p // 8] |= 1 << (p % 8)
    got_set = {i * 8 + b for i, byte in enumerate(bf) for b in range(8)
               if byte >> b & 1}
    want_set = {i * 8 + b for i, byte in enumerate(expect) for b in range(8)
                if byte >> b & 1}
    assert got_set == want_set


def test_bloom_params_floor():
    n_bits, k = bloom_params(0, 10)
    assert n_bits == 64 and k >= 1
    n_bits, k = bloom_params(1000, 10)
    assert n_bits == 10000 and k == 7
