"""Curation job surface: the composed curate() DataFrame, the partitioned
sink with its completion marker, and partition pruning on read-back."""

import os

from pyspark.sql import functions as F

from jobs.curate_job import curate, write_curated


def test_curate_drops_benchmark_and_dups(spark, documents):
    docs = documents.select("doc_id", "lang", "source", "text")
    copies = docs.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + F.lit(9_000_000)).alias("doc_id"),
        "lang", "source", "text",
    )
    bench = docs.filter(F.col("source") == "src0")
    out = curate(
        docs.unionByName(copies), "doc_id", "text", bench, ngram_n=4
    )
    rows = out.collect()
    assert len(rows) > 0
    ids = {r["doc_id"] for r in rows}
    # exact copies fold onto their originals (min id wins)
    assert not any(i >= 9_000_000 for i in ids)
    # benchmark-source docs are self-contaminated and drop out
    assert not any(r["source"] == "src0" for r in rows)
    # output keeps the input schema (gate columns dropped)
    assert set(out.columns) == {"doc_id", "lang", "source", "text"}


def test_write_curated_marker_and_partition_pruning(spark, documents, tmp_path):
    outdir = str(tmp_path / "curated")
    docs = documents.select("doc_id", "lang", "source", "text")
    bench = docs.filter(F.col("source") == "src0")
    out = curate(docs, "doc_id", "text", bench, ngram_n=4)
    write_curated(spark, out, outdir, ["lang"])

    assert os.path.exists(os.path.join(outdir, "_CURATED"))

    back = spark.read.parquet(outdir).filter(F.col("lang") == "en")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the lang filter must prune partitions at the source, not scan+filter
    assert "PartitionFilters: [isnotnull(lang" in plan, plan
    assert back.count() == out.filter(F.col("lang") == "en").count()


def test_curate_rejects_zero_cap(spark, documents):
    import pytest

    docs = documents.select("doc_id", "lang", "source", "text")
    bench = docs.filter(F.col("source") == "src0")
    # cap=0 used to pass validation (0 is not None) and then silently
    # skip the capping stage via `if per_stratum_cap and ...`
    with pytest.raises(ValueError, match="per_stratum_cap"):
        curate(docs, "doc_id", "text", bench,
               strata_cols=["lang"], per_stratum_cap=0)
