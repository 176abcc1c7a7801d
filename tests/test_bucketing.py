"""Bucketed layout: a join between two tables bucketed on the join key
compiles to an exchange-free plan, and results match the plain join."""

import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.plans.bucketing import bucketed_join, write_bucketed


@pytest.fixture(scope="module")
def bucketed_tables(spark, documents):
    # managed tables land in the session's default warehouse; DROP TABLE
    # removes their files in teardown
    sigs = documents.select(
        "doc_id", F.length("text").alias("n_chars")
    )
    labels = documents.select(
        "doc_id", (F.col("doc_id") % 7).alias("cluster")
    )
    write_bucketed(sigs, "t_bucket_sigs", "doc_id", 8)
    write_bucketed(labels, "t_bucket_labels", "doc_id", 8)
    yield "t_bucket_sigs", "t_bucket_labels"
    spark.sql("DROP TABLE IF EXISTS t_bucket_sigs")
    spark.sql("DROP TABLE IF EXISTS t_bucket_labels")


def test_bucketed_join_has_no_exchange(spark, bucketed_tables):
    lt, rt = bucketed_tables
    # disable broadcast: bucketing exists for the big-x-big regime where
    # the alternative is shuffling BOTH sides (tiny test tables would
    # otherwise broadcast and bypass the bucketed scan entirely)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, lt, rt, "doc_id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # the whole point of the layout: bucket-aligned scans feeding the
        # join with no shuffle on either side
        assert "Bucketed: true" in plan, plan
        assert "Exchange" not in plan, plan
        assert joined.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, documents, bucketed_tables):
    lt, rt = bucketed_tables
    got = sorted(tuple(r) for r in bucketed_join(spark, lt, rt, "doc_id").collect())
    want = sorted(
        tuple(r)
        for r in documents.select("doc_id", F.length("text").alias("n_chars"))
        .join(documents.select("doc_id", (F.col("doc_id") % 7).alias("cluster")),
              "doc_id")
        .collect()
    )
    assert got == want


def test_write_bucketed_rejects_bad_count(spark, documents):
    with pytest.raises(ValueError):
        write_bucketed(documents, "t_nope", "doc_id", 0)
