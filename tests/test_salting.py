"""Triangle-block salting: a mega-bucket must yield ALL pairs (no recall
loss) with bounded per-block membership."""

import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.operators.dedup import _salted_self_join_pairs


def test_mega_bucket_all_pairs(spark):
    # one bucket with 100 members, shard_target 10 -> 10 shards, 55 blocks
    rows = [(f"x{i:03d}", 0, 7) for i in range(100)]
    bands = spark.createDataFrame(rows, "id string, band int, key long")
    pairs = {
        (r["a_id"], r["b_id"])
        for r in _salted_self_join_pairs(
            bands, ["band", "key"], shard_target=10
        ).collect()
    }
    want = {
        (f"x{i:03d}", f"x{j:03d}") for i in range(100) for j in range(i + 1, 100)
    }
    assert pairs == want  # 4950 pairs, none missing, none duplicated


def test_multiple_buckets_no_cross_pairs(spark):
    rows = [(f"a{i}", 0, 1) for i in range(5)] + [(f"b{i}", 0, 2) for i in range(5)]
    bands = spark.createDataFrame(rows, "id string, band int, key long")
    pairs = {
        (r["a_id"], r["b_id"])
        for r in _salted_self_join_pairs(bands, ["band", "key"], 3).collect()
    }
    assert all(x[0][0] == x[1][0] for x in pairs), "no cross-bucket pairs"
    assert len(pairs) == 10 + 10


def test_hamming_band_keys_zero_hamming_split_contract(spark):
    # max_hamming=0 -> c == m, key_width == 64: the JVM masks long shift
    # amounts mod 64, so the generic split would emit band = low bits of
    # bk instead of 0 — the special case must keep the documented
    # (id, hash, band, key) contract: band constantly 0, key == hash.
    from fuzzymatch_spark.operators.dedup import hamming_band_keys

    rows = [("a", 7), ("b", 7), ("c", -12345678901234567)]
    df = spark.createDataFrame(rows, "id string, h long")
    out = hamming_band_keys(df, "id", "h", 8, 0, split_band_key=True).collect()
    assert len(out) == 3  # single combo per row
    assert all(r["band"] == 0 for r in out)
    assert {(r["id"], r["key"]) for r in out} == {
        ("a", 7), ("b", 7), ("c", -12345678901234567)
    }


def test_over_hard_cap_dropped(spark):
    rows = [(f"x{i}", 0, 7) for i in range(50)]
    bands = spark.createDataFrame(rows, "id string, band int, key long")
    pairs = _salted_self_join_pairs(
        bands, ["band", "key"], shard_target=2, max_shards=4
    ).collect()
    # bucket_n=50 > 2*4 -> dropped entirely (caller accounts via stats)
    assert pairs == []
