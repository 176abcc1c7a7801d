"""Incremental signature ingest: new files processed exactly once; a second
run with the same stream checkpoint processes only NEW files (the streaming
counterpart of the pipeline resume guarantee)."""

import os

import pytest

from fuzzymatch_spark.streaming.ingest import incremental_signatures

SCHEMA = "doc_id bigint, text string"


def _write_batch(spark, path, rows):
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(path)


def test_incremental_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "landing")
    out = str(tmp_path / "signatures")
    ckpt = str(tmp_path / "ckpt")

    _write_batch(spark, inp, [(1, "spark shuffle join"), (2, "window batch scan")])
    incremental_signatures(spark, inp, SCHEMA, out, ckpt, "doc_id", "text")
    first = spark.read.parquet(out)
    assert first.count() == 2
    assert {r["id"] for r in first.collect()} == {1, 2}
    cols = set(first.columns)
    assert {"caption_norm", "minhash_sig", "simhash", "char_mask"} <= cols

    # second landing batch: only the 2 new rows are processed
    _write_batch(spark, inp, [(3, "stream table merge"), (4, "hash key sort")])
    incremental_signatures(spark, inp, SCHEMA, out, ckpt, "doc_id", "text")
    second = spark.read.parquet(out)
    assert second.count() == 4  # no re-processing of files 1-2
    assert {r["id"] for r in second.collect()} == {1, 2, 3, 4}

    # re-run with nothing new: no-op
    incremental_signatures(spark, inp, SCHEMA, out, ckpt, "doc_id", "text")
    assert spark.read.parquet(out).count() == 4
