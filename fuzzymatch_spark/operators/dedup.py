"""Near-duplicate candidate generation + verification.

This is the engine's replacement for the reference's per-candidate prefilter
cascade at corpus scale (SURVEY.md §2.5): instead of scoring every
(query, candidate) pair behind O(1)/O(n) prefilters
(`Sources/FuzzyMatch/FuzzyMatcher.swift:372-418`), we generate candidate
pairs with set-similarity joins and verify only those:

* exact duplicates  — hash groupBy, no pair explosion
  (corpus-scale `checkExactMatch`, `FuzzyMatcher.swift:507-520`)
* MinHash banded LSH — scalable analog of the trigram count filter
  (`Sources/FuzzyMatch/Trigrams.swift:161-177`); same shingle packing
* SimHash Hamming bands — token-level near-dup (north rule)
* pHash Hamming bands  — perceptual image near-dup (north rule)

All similarity joins are decomposed into equi-join on a band key +
post-filter (the standard LSH theta-join reduction).  Hot-bucket skew is
handled by capping bucket sizes (boilerplate captions create mega-buckets;
dropped buckets are reported, not silently ignored) plus AQE skew-join.

Scale notes (100 TB / 10^12 rows):
* band keys are 64-bit hashes — the band self-join shuffles only
  (band_key, id), never text or signatures;
* within-bucket pair generation is quadratic per bucket — the cap bounds it;
* verification joins signatures back by id (sort-merge on id, AQE-coalesced),
  so full strings ride exactly two shuffles end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from fuzzymatch_spark.config import DedupConfig
from fuzzymatch_spark.functions.udfs import make_signature_udf, make_verify_udf


def compute_signatures(
    df: DataFrame, id_col: str, text_col: str, cfg: DedupConfig | None = None
) -> DataFrame:
    """One fused UDF pass: id, text -> id + signature columns."""
    cfg = cfg or DedupConfig()
    sig = make_signature_udf(cfg)
    out = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
        sig(F.col(text_col)).alias("_s"),
    )
    return out.select(
        "id",
        "text",
        F.col("_s.caption_norm").alias("caption_norm"),
        F.col("_s.char_mask").alias("char_mask"),
        F.col("_s.n_shingles").alias("n_shingles"),
        F.col("_s.shingles").alias("shingles"),
        F.col("_s.minhash_sig").alias("minhash_sig"),
        F.col("_s.simhash").alias("simhash"),
    )


def exact_dup_edges(sig_df: DataFrame) -> DataFrame:
    """Star edges (min_id -> other) within identical-normalized-text groups.

    groupBy avoids pair explosion entirely: a group of n exact duplicates
    emits n-1 star edges, not n*(n-1)/2 pairs.
    """
    grouped = (
        sig_df.groupBy("caption_norm")
        .agg(F.min("id").alias("a_id"), F.collect_list("id").alias("ids"))
        .filter(F.size("ids") > 1)
    )
    return (
        grouped.select("a_id", F.explode("ids").alias("b_id"))
        .filter(F.col("a_id") != F.col("b_id"))
        .withColumn("source", F.lit("exact"))
    )


def minhash_band_edges(sig_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Banded-LSH self-join on MinHash signatures.

    One ``explode`` produces (band, key) rows; the self-join is an equi-join
    on the 64-bit band key.  Buckets larger than ``cfg.max_bucket_size`` are
    dropped (boilerplate mega-buckets; the exact-dup stage already links
    identical text, and the suffix stage catches shared boilerplate runs).
    """
    r = cfg.rows_per_band
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.xxhash64(F.lit(i), F.slice("minhash_sig", i * r + 1, r)).alias("key"),
            )
            for i in range(cfg.bands)
        ]
    )
    bands = sig_df.select(
        F.col("id"), F.explode(band_structs).alias("bk")
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    # hot-bucket cap: count per bucket with an aggregate (map-side partial),
    # drop oversized buckets
    sizes = bands.groupBy("band", "key").agg(F.count("*").alias("bucket_n"))
    bands = bands.join(
        sizes.filter(F.col("bucket_n") <= cfg.max_bucket_size).select("band", "key"),
        on=["band", "key"],
    )

    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .withColumn("source", F.lit("minhash"))
    )


def _hamming_band_edges(
    df: DataFrame,
    id_col: str,
    hash_col: str,
    n_bands: int,
    max_hamming: int,
    source: str,
    max_bucket_size: int = 100_000,
) -> DataFrame:
    """Generic Hamming-band equi-join: split a 64-bit hash into ``n_bands``
    equal bit-slices; any pair within Hamming distance ``n_bands - 1`` shares
    at least one identical slice (pigeonhole), so the equi-join on
    (band, slice) has guaranteed recall for ``max_hamming <= n_bands - 1``.
    Verified with JVM-side ``bit_count(a ^ b)`` — no Python in this path.
    """
    assert 64 % n_bands == 0
    width = 64 // n_bands
    mask = (1 << width) - 1
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col(hash_col), i * width)
                .bitwiseAND(F.lit(mask))
                .alias("key"),
            )
            for i in range(n_bands)
        ]
    )
    bands = df.select(
        F.col(id_col).alias("id"), F.col(hash_col), F.explode(band_structs).alias("bk")
    ).select("id", hash_col, F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))

    sizes = bands.groupBy("band", "key").agg(F.count("*").alias("bucket_n"))
    bands = bands.join(
        sizes.filter(F.col("bucket_n") <= max_bucket_size).select("band", "key"),
        on=["band", "key"],
    )

    a = bands.alias("a")
    b = bands.alias("b")
    return (
        a.join(b, on=["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
            )
            <= F.lit(max_hamming)
        )
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .dropDuplicates(["a_id", "b_id"])
        .withColumn("source", F.lit(source))
    )


def simhash_band_edges(sig_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """4 x 16-bit bands: guaranteed recall for Hamming <= 3 (pigeonhole)."""
    n_bands = max(4, cfg.simhash_max_hamming + 1)
    # round up to a divisor of 64
    for nb in (4, 8, 16, 32):
        if nb >= n_bands and 64 % nb == 0:
            n_bands = nb
            break
    return _hamming_band_edges(
        sig_df, "id", "simhash", n_bands, cfg.simhash_max_hamming, "simhash",
        cfg.max_bucket_size,
    )


def phash_band_edges(
    images_df: DataFrame, cfg: DedupConfig, id_col: str = "image_id",
    phash_col: str = "phash",
) -> DataFrame:
    """8 x 8-bit bands: guaranteed recall for Hamming <= 7 >= cfg default 6."""
    n_bands = 8
    while n_bands - 1 < cfg.phash_max_hamming:
        n_bands *= 2
    return _hamming_band_edges(
        images_df, id_col, phash_col, n_bands, cfg.phash_max_hamming, "phash",
        cfg.max_bucket_size,
    )


def ngram_jaccard_pairs(
    sig_df: DataFrame, threshold: float = 0.6, threshold_pct: int | None = None
) -> DataFrame:
    """EXACT n-gram Jaccard pair join via shingle inverted index.

    This is the exact form of the trigram filter
    (`Sources/FuzzyMatch/Trigrams.swift:161-177`) as a relational plan: a
    pair with Jaccard > 0 shares >= 1 shingle, so the equi-join on exploded
    shingles has 100% candidate recall; the groupBy count IS the exact
    intersection size.  The threshold compare is integer-only
    (``100*inter >= pct*(na+nb-inter)``) — bit-identical across engines.

    Scale note: exact inverted-index joins explode on hot shingles; at
    10^12 rows use ``minhash_band_edges`` (probabilistic, bounded) or add
    prefix filtering — this operator is the correctness oracle / small-table
    path.  Everything here is JVM-side (no Python).
    """
    pct = threshold_pct if threshold_pct is not None else int(round(threshold * 100))
    grams = sig_df.select("id", F.explode("shingles").alias("g"))
    a = grams.alias("a")
    b = grams.alias("b")
    inter = (
        a.join(b, on="g")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .agg(F.count("*").alias("inter"))
    )
    sizes = sig_df.select(F.col("id"), F.col("n_shingles").cast("long").alias("n"))
    return (
        inter.join(sizes.withColumnRenamed("id", "a_id")
                   .withColumnRenamed("n", "na"), on="a_id")
        .join(sizes.withColumnRenamed("id", "b_id")
              .withColumnRenamed("n", "nb"), on="b_id")
        .filter(
            F.lit(100) * F.col("inter")
            >= F.lit(pct) * (F.col("na") + F.col("nb") - F.col("inter"))
        )
        .select("a_id", "b_id", F.col("inter").cast("long").alias("inter"),
                "na", "nb")
    )


def verify_edges(
    edges: DataFrame, sig_df: DataFrame, cfg: DedupConfig | None = None
) -> DataFrame:
    """Join normalized text back by id and run the verify kernel; keep edges
    with score >= cfg.min_score."""
    cfg = cfg or DedupConfig()
    verify = make_verify_udf(cfg)
    norms = sig_df.select("id", "caption_norm")
    joined = (
        edges.join(norms.withColumnRenamed("id", "a_id")
                   .withColumnRenamed("caption_norm", "a_norm"), on="a_id")
        .join(norms.withColumnRenamed("id", "b_id")
              .withColumnRenamed("caption_norm", "b_norm"), on="b_id")
    )
    scored = joined.withColumn("_v", verify(F.col("a_norm"), F.col("b_norm")))
    return (
        scored.select(
            "a_id",
            "b_id",
            "source",
            F.col("_v.jaccard").alias("jaccard"),
            F.col("_v.dl_dist").alias("dl_dist"),
            F.col("_v.dl_sim").alias("dl_sim"),
            F.col("_v.score").alias("score"),
            F.col("_v.kind").alias("kind"),
        )
        .filter(F.col("score") >= F.lit(cfg.min_score))
    )


def candidate_edges(sig_df: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Union of all candidate sources, deduplicated (SURVEY.md §2.8)."""
    exact = exact_dup_edges(sig_df)
    mh = minhash_band_edges(sig_df, cfg)
    sh = simhash_band_edges(sig_df, cfg)
    all_edges = exact.unionByName(mh).unionByName(sh)
    return (
        all_edges.groupBy("a_id", "b_id")
        .agg(F.min("source").alias("source"))
    )
