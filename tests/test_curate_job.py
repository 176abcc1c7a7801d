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


def test_curate_fuzzy_decon_drops_near_copies(spark, documents):
    from pyspark.sql import functions as F

    # plant a TOKEN-REVERSED copy of a benchmark doc under a new id:
    # its token 4-grams are reversed sequences (invisible to the exact
    # tier) but its space-excluded trigram shingle set is IDENTICAL
    # (shingles never span spaces), so only the fuzzy tier can drop it
    docs = documents.select("doc_id", "source", "lang", "text")
    bench = docs.filter(F.col("source") == "src0")
    first = bench.select("doc_id", "text").first()
    rev = " ".join(reversed(first["text"].split(" ")))
    near = spark.createDataFrame(
        [(90_000_001, "srcX", "xx", rev)],
        "doc_id long, source string, lang string, text string",
    )
    base = curate(
        docs.unionByName(near), "doc_id", "text", bench,
        ngram_n=4, drop_benchmark_ids=True,
    )
    strict = curate(
        docs.unionByName(near), "doc_id", "text", bench,
        ngram_n=4, drop_benchmark_ids=True, fuzzy_decon=True,
    )
    base_ids = {r["doc_id"] for r in base.select("doc_id").collect()}
    strict_ids = {r["doc_id"] for r in strict.select("doc_id").collect()}
    assert strict_ids <= base_ids
    assert 90_000_001 in base_ids        # exact tier can't see it...
    assert 90_000_001 not in strict_ids  # ...the fuzzy tier can


def test_curate_budget_stage_bounds_tokens(spark, documents):
    from pyspark.sql import functions as F

    docs = documents.select("doc_id", "source", "lang", "text")
    bench = docs.filter(F.col("source") == "src0")
    out = curate(
        docs, "doc_id", "text", bench,
        ngram_n=4, strata_cols=["lang"], per_stratum_cap=1000,
        budget_tokens=500,
    )
    per = (
        out.select(
            "lang",
            F.size(F.filter(F.split("text", " "),
                            lambda t: F.length(t) > 0)).alias("nt"),
        )
        .groupBy("lang").agg(F.sum("nt").alias("total"))
        .collect()
    )
    assert per, "budget stage emptied the corpus"
    for r in per:
        assert r["total"] <= 500, (r["lang"], r["total"])


def test_curate_budget_requires_strata(spark, documents):
    import pytest as _pytest
    from pyspark.sql import functions as F

    docs = documents.select("doc_id", "source", "lang", "text")
    bench = docs.filter(F.col("source") == "src0")
    with _pytest.raises(ValueError):
        curate(docs, "doc_id", "text", bench, budget_tokens=100)


def test_curate_embedding_tier_drops_semantic_leaks(spark, documents, embeddings):
    """The semantic tier: a corpus doc whose EMBEDDING sits within the
    cosine threshold of a benchmark embedding drops out even though its
    text shares no n-grams with the benchmark; both-or-neither param
    validation holds."""
    import pytest

    docs = documents.select("doc_id", "lang", "source", "text")
    bench = docs.filter(F.col("source") == "src0")
    emb = embeddings.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("embedding")
    )
    # benchmark embeddings: perturbed copies of the vectors at doc ids
    # 1 and 3 (cos ~0.99 vs those corpus docs ONLY — driver embeddings
    # are independent random vectors)
    bench_emb = emb.filter(F.col("vec_id").isin(1, 3)).select(
        F.col("vec_id").cast("string").alias("bench_id"),
        F.transform("embedding", lambda x: x + F.lit(0.02)).alias("embedding"),
    )

    base = curate(docs, "doc_id", "text", bench, ngram_n=4)
    out = curate(
        docs, "doc_id", "text", bench, ngram_n=4,
        embeddings_df=emb, bench_embeddings_df=bench_emb,
    )
    base_ids = {r["doc_id"] for r in base.collect()}
    got_ids = {r["doc_id"] for r in out.collect()}
    dropped = base_ids - got_ids
    assert dropped == ({1, 3} & base_ids), dropped
    assert got_ids == base_ids - {1, 3}

    with pytest.raises(ValueError, match="together"):
        curate(docs, "doc_id", "text", bench, embeddings_df=emb)
