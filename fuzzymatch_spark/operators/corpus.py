"""Corpus-curation operators for large-scale training-data pipelines.

These cover the curation steps that sit *around* dedup in a real pipeline
(reference analog: the FuzzyMatch CLI filters a candidate corpus before
scoring, ``Sources/FuzzyMatch/FuzzyMatch.swift`` top-level flow; here the
corpus itself is the product, so the filters are corpus-level):

* Gopher-style repetition statistics — per-document duplicate / most-common
  n-gram fractions (Rae et al., "Scaling Language Models: ... Gopher",
  arXiv:2112.11446 §A1.1), computed entirely *within the row* with JVM
  higher-order array functions: zero shuffle, zero Python.  At 100 TB this
  is a pure map stage that fuses into the scan.
* n-gram benchmark decontamination — drop/flag training docs sharing token
  n-grams with an evaluation set (GPT-3 appendix-C style).  The benchmark
  gram set is small by construction, so the join is an explicit
  ``broadcast()``: the 100 TB side never shuffles.
* deterministic stratified sampling — per-(stratum) top-k by a portable
  hash (md5 hex of the id), reproducible across engines and runs; the
  scale path for rate-based sampling (a pure filter, no window) is noted
  in the docstring.
* TF-IDF query ranking — corpus document frequencies for the query's terms
  only (tokens are filtered to the query vocabulary *before* the exchange,
  so the shuffled key-space is |query terms|, not |vocabulary|), then a
  weighted top-k.

Every operator here has a DuckDB oracle in ``__spark_entry__.oracle_sql``
built from an *independent* relational formulation (unnest + GROUP BY)
rather than mirroring the Spark array expressions — agreement is a real
cross-check, not an echo.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fuzzymatch_spark.functions.bloom import (
    bloom_build,
    bloom_might_contain,
    bloom_params,
)


# --------------------------------------------------------------------------
# Gopher-style repetition statistics
# --------------------------------------------------------------------------

def _grams(toks, n: int):
    """Token n-grams as strings, [] when the doc has < n tokens."""
    if n == 1:
        return toks
    return F.when(
        F.size(toks) >= n,
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _run_stats(sorted_arr):
    """(best_run, n_singleton_runs) over a sorted array, via one aggregate().

    best_run = occurrence count of the most frequent element;
    n_singletons = number of distinct elements occurring exactly once.
    Runs as a single JVM fold over the array — no explode, no shuffle.
    """
    init = F.struct(
        F.lit(None).cast("string").alias("prev"),
        F.lit(0).alias("run"),
        F.lit(0).alias("best"),
        F.lit(0).alias("singles"),
    )

    def step(acc, x):
        same = acc["prev"].isNotNull() & (x == acc["prev"])
        closed_single = F.when(
            acc["prev"].isNotNull() & ~same & (acc["run"] == 1), 1
        ).otherwise(0)
        return F.struct(
            x.alias("prev"),
            F.when(same, acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
            F.greatest(
                acc["best"], F.when(same, acc["run"] + 1).otherwise(F.lit(1))
            ).alias("best"),
            (acc["singles"] + closed_single).alias("singles"),
        )

    def finish(acc):
        return F.struct(
            acc["best"].alias("best"),
            (
                acc["singles"]
                + F.when(acc["prev"].isNotNull() & (acc["run"] == 1), 1)
                .otherwise(0)
            ).alias("singles"),
        )

    return F.aggregate(sorted_arr, init, step, finish)


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document repetition metrics (Gopher §A1.1, token-gram form).

    Columns:
      n_tokens            token count
      top_unigram_frac    count of the most frequent token / n_tokens
      top_2gram_frac      count of the most frequent 2-gram / n 2-grams
      excess_2gram_frac   1 - distinct/total 2-grams (repeat occurrences)
      dup_3gram_frac      fraction of 3-gram positions whose gram occurs
                          >= 2 times in the doc
      repetition_pass     1 when below the Gopher-ish thresholds

    Entirely within-row (higher-order array functions): at 100 TB this is
    a map-only stage — no exchange, payload never leaves the scan task.
    """
    toks = F.split(F.col(text_col), " ")
    g2 = _grams(toks, 2)
    g3 = _grams(toks, 3)
    s1 = _run_stats(F.array_sort(toks))
    s2 = _run_stats(F.array_sort(g2))
    s3 = _run_stats(F.array_sort(g3))

    n1 = F.size(toks)
    n2 = F.size(g2)
    n3 = F.size(g3)

    top_uni = F.round(s1["best"] / F.greatest(n1, F.lit(1)), 6)
    top_2 = F.round(
        F.when(n2 > 0, s2["best"] / n2).otherwise(F.lit(0.0)), 6
    )
    excess_2 = F.round(
        F.when(n2 > 0, 1.0 - F.size(F.array_distinct(g2)) / n2)
        .otherwise(F.lit(0.0)),
        6,
    )
    dup_3 = F.round(
        F.when(n3 > 0, (n3 - s3["singles"]) / n3).otherwise(F.lit(0.0)), 6
    )

    out = df.select(
        F.col(id_col).alias("doc_id"),
        n1.cast("long").alias("n_tokens"),
        top_uni.alias("top_unigram_frac"),
        top_2.alias("top_2gram_frac"),
        excess_2.alias("excess_2gram_frac"),
        dup_3.alias("dup_3gram_frac"),
    )
    return out.withColumn(
        "repetition_pass",
        F.when(
            (F.col("top_unigram_frac") <= 0.30)
            & (F.col("top_2gram_frac") <= 0.20)
            & (F.col("dup_3gram_frac") <= 0.50),
            1,
        )
        .otherwise(0)
        .cast("int"),
    )


# --------------------------------------------------------------------------
# Benchmark decontamination
# --------------------------------------------------------------------------

def decontaminate_ngrams(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
) -> DataFrame:
    """Flag training docs sharing any token n-gram with a benchmark set.

    GPT-3-style decontamination (Brown et al. 2020, appendix C) at the
    document level: a doc is contaminated when any of its distinct token
    n-grams appears in the benchmark's gram set.

    Scale shape: the benchmark gram set is small (eval suites are MBs, the
    corpus is TBs) — it is explicitly ``broadcast()``, so the corpus side
    is scan → in-task gram explode → broadcast-hash semi-count.  No shuffle
    of corpus data at any width.

    Returns (doc_id, n_gram_hits, contaminated) for every input doc.
    """
    def gram_rows(df, out_id):
        toks = F.split(F.col(text_col), " ")
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array_distinct(_grams(toks, n))).alias("gram"),
        )

    bench_grams = benchmark.select(
        F.explode(
            F.array_distinct(_grams(F.split(F.col(text_col), " "), n))
        ).alias("gram")
    ).distinct()

    hits = (
        gram_rows(docs, "doc_id")
        .join(F.broadcast(bench_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_gram_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_gram_hits", F.lit(0)).alias("n_gram_hits"),
            F.when(F.coalesce("n_gram_hits", F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def decontaminate_ngrams_bloom(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    expected_grams: int = 1_000_000,
    bits_per_gram: int = 10,
) -> DataFrame:
    """``decontaminate_ngrams`` with a Bloom-bounded broadcast — EXACT
    output (bit-identical to the plain operator), built for the regime
    where the benchmark gram set is too large to broadcast as strings.

    Two stages:

    1. **Bloom probe, in-task.**  The benchmark grams fold into one
       Bloom filter row (``bloom_filter_agg`` over ``xxhash64(gram)``,
       ~``bits_per_gram``/8 bytes per gram — 10x smaller than the gram
       strings, so it broadcasts where the exact set cannot).  Corpus
       gram rows stream through ``might_contain`` and ~all clean grams
       drop where they were produced — no shuffle of clean data.
    2. **Exact residual join.**  Bloom false positives (~0.8% at 10
       bits/gram) plus true hits — a tiny stream — shuffle-join against
       the true gram set, so the output is exactly the plain operator's:
       (doc_id, n_gram_hits, contaminated).

    At 100 TB this is the decontamination shape that survives a large
    eval registry: broadcast O(bits), shuffle O(hits + fp), never
    O(corpus grams).

    The filter itself is the engine-owned column-expression Bloom filter
    (``functions/bloom.py`` — one shared definition with the survivor
    payload filter): k double-hashed probe positions built distributed as
    a ``bit_or`` packed aggregation with one O(n_bits/64) driver collect,
    shipped as ONE ``binary`` plan literal and probed JVM-side via
    ``forall`` byte-extract bit tests — whole-stage codegen, no Python
    anywhere.
    """
    def gram_rows(df, out_id):
        toks = F.split(F.col(text_col), " ")
        return df.select(
            F.col(id_col).alias(out_id),
            F.explode(F.array_distinct(_grams(toks, n))).alias("gram"),
        )

    bench_grams = benchmark.select(
        F.explode(
            F.array_distinct(_grams(F.split(F.col(text_col), " "), n))
        ).alias("gram")
    ).distinct()

    n_bits, k = bloom_params(expected_grams, bits_per_gram)
    bf = bloom_build(bench_grams, F.col("gram"), n_bits, k)

    maybe = gram_rows(docs, "doc_id").filter(
        bloom_might_contain(bf, F.col("gram"), n_bits, k)
    )
    hits = (
        maybe.join(bench_grams, "gram")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_gram_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_gram_hits", F.lit(0)).alias("n_gram_hits"),
            F.when(F.coalesce("n_gram_hits", F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("contaminated"),
        )
    )


def split_by_hash(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, float], ...] = (
        ("train", 0.8), ("val", 0.1), ("test", 0.1),
    ),
) -> DataFrame:
    """Deterministic train/val/test assignment by id hash — the split
    every training pipeline needs, as a ZERO-SHUFFLE map.

    The split fraction is the first 12 hex digits of ``md5(str(id))``
    over 16^12 — bit-identical across engines (same digest text in Spark
    and DuckDB), so membership is reproducible run-to-run, stable under
    corpus growth (a doc's split never changes when other docs are added
    — the property rand()-based splitting lacks), and oracle-checkable.
    Returns (doc_id, split).
    """
    if not splits:
        raise ValueError("splits must be non-empty")
    if any(w <= 0 for _, w in splits):
        raise ValueError("split weights must be positive")
    total = sum(w for _, w in splits)
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"split weights must sum to 1, got {total}")

    h = F.conv(
        F.substring(
            F.md5(F.col(id_col).cast("string").cast("binary")), 1, 12
        ),
        16,
        10,
    ).cast("long")
    frac = h / F.lit(float(16**12))
    expr = None
    cum = 0.0
    for name, w in splits[:-1]:
        # 12-dp rounding keeps each threshold the EXACT double a SQL
        # literal like 0.9 parses to (0.8 + 0.1 accumulates to
        # 0.9000000000000001 otherwise) — cross-engine boundary safety
        cum = round(cum + w, 12)
        cond = frac < F.lit(cum)
        expr = F.when(cond, F.lit(name)) if expr is None else expr.when(
            cond, F.lit(name)
        )
    last = splits[-1][0]
    split_col = F.lit(last) if expr is None else expr.otherwise(F.lit(last))
    return df.select(F.col(id_col).alias("doc_id"), split_col.alias("split"))


def pack_chunks(
    chunks: DataFrame,
    part_cols: list[str],
    doc_col: str = "doc_id",
    chunk_col: str = "chunk_id",
    token_col: str = "n_chunk_tokens",
    budget: int = 128,
) -> DataFrame:
    """Concat-and-cut sequence packing: assign every chunk the training
    bin where it STARTS when chunks are concatenated in a deterministic
    order and cut every ``budget`` tokens — the standard pretraining
    packing shape (bin_id = floor(preceding token total / budget)).

    Packing is inherently sequential, so it runs per ``part_cols``
    partition (writer shards / language / source) — one window shuffle
    on the partition key, never a global sort: at 100 TB a single global
    packing order would serialize the job, and per-shard packing is what
    real pipelines do anyway.  Order within a partition is
    (md5(doc id), doc id, chunk id): deterministic, engine-portable, and
    it decorrelates adjacent bins from crawl order.

    Returns the input columns + ``bin_id`` (long).
    """
    if not part_cols:
        raise ValueError(
            "part_cols is required: packing without a partition key is a "
            "global sequential sort — pick the writer-shard column(s)"
        )
    if budget < 1:
        raise ValueError("budget must be >= 1")
    w = Window.partitionBy(*part_cols).orderBy(
        F.md5(F.col(doc_col).cast("string").cast("binary")),
        F.col(doc_col),
        F.col(chunk_col),
    )
    prev = F.coalesce(
        F.sum(F.col(token_col).cast("long")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
        F.lit(0),
    )
    return chunks.withColumn(
        "bin_id", F.floor(prev / F.lit(budget)).cast("long")
    )


# --------------------------------------------------------------------------
# Deterministic stratified sampling
# --------------------------------------------------------------------------

def stratified_sample(
    df: DataFrame, strata_cols: list[str], id_col: str, k: int
) -> DataFrame:
    """Deterministic top-k sample per stratum, ordered by md5(id) hex.

    md5 over the decimal string of the id is bit-identical across engines
    (same hex digest in Spark and DuckDB), so the sample is reproducible
    and oracle-checkable — unlike rand()-based sampling.

    Scale note: exact-k needs a per-stratum window (one shuffle on the
    strata key).  When an approximate rate suffices, the zero-shuffle path
    is ``filter(conv(substring(md5(id),1,8),16,10) % 100 < pct)`` — a pure
    map; use that for the 100 TB bulk pass and this exact-k form for
    per-stratum caps on the (much smaller) survivor set.
    """
    w = (
        Window.partitionBy(*strata_cols)
        .orderBy(F.md5(F.col(id_col).cast("string").cast("binary")), F.col(id_col))
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
        .select(
            F.col(id_col).alias("doc_id"),
            *strata_cols,
            F.col("sample_rank").cast("int").alias("sample_rank"),
        )
    )


# --------------------------------------------------------------------------
# Document chunking (overlapping token windows)
# --------------------------------------------------------------------------

def chunk_documents(
    df: DataFrame,
    id_col: str,
    text_col: str,
    chunk_tokens: int = 32,
    overlap: int = 8,
) -> DataFrame:
    """Split each document into overlapping token-window chunks — the
    standard pre-embedding / pre-training segmentation step.

    Chunks start every ``chunk_tokens - overlap`` tokens; the final chunk
    may be short (tail coverage beats fixed-length truncation for
    training data).  Chunk boundaries are computed within the row with
    JVM array expressions and exploded in-task: a map-side explode, no
    shuffle — at 100 TB this fuses into the scan and the output is
    written straight back out partition-aligned with the input.

    Emits (doc_id, chunk_id, start_token, n_chunk_tokens, chunk_text).
    """
    if overlap >= chunk_tokens:
        raise ValueError("overlap must be smaller than chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.floor((n - chunk_tokens + stride - 1) / stride).cast("long") + 1
    )
    chunks = F.transform(
        F.sequence(F.lit(0), (n_chunks - 1).cast("int")),
        lambda i: F.struct(
            i.cast("int").alias("chunk_id"),
            (i * stride).cast("long").alias("start_token"),
            F.slice(toks, i * stride + 1, chunk_tokens).alias("ctoks"),
        ),
    )
    return (
        df.select(F.col(id_col).alias("doc_id"), F.explode(chunks).alias("c"))
        .select(
            "doc_id",
            F.col("c.chunk_id").alias("chunk_id"),
            F.col("c.start_token").alias("start_token"),
            F.size("c.ctoks").cast("long").alias("n_chunk_tokens"),
            F.array_join("c.ctoks", " ").alias("chunk_text"),
        )
    )


# --------------------------------------------------------------------------
# Dedup-quality evaluation (precision / recall vs labeled pairs)
# --------------------------------------------------------------------------

def pair_eval(
    pred: DataFrame,
    truth: DataFrame,
    a_col: str = "a_id",
    b_col: str = "b_id",
) -> DataFrame:
    """Precision/recall/F1 of a predicted duplicate-pair set against a
    labeled truth set — the metric the north rule's "dup-pair recall
    >= 0.99 on a labeled eval shard" gate is scored on.

    Pairs are canonicalized (least, greatest) and deduplicated on both
    sides, then matched with one full outer equi-join on the pair key and
    reduced to a single row of counts + ratios.  Both the canonicalization
    and the counts are map-side combinable; nothing is collected — at
    100 TB the eval shard's truth set is the small side and the join
    broadcasts it, so the predicted-edge table never shuffles for this.
    """
    def canon(df):
        return df.select(
            F.least(F.col(a_col), F.col(b_col)).alias("a"),
            F.greatest(F.col(a_col), F.col(b_col)).alias("b"),
        ).distinct()

    j = (
        canon(pred).withColumn("in_pred", F.lit(1))
        .join(
            canon(truth).withColumn("in_truth", F.lit(1)),
            ["a", "b"],
            "full",
        )
        .select(
            F.coalesce("in_pred", F.lit(0)).alias("in_pred"),
            F.coalesce("in_truth", F.lit(0)).alias("in_truth"),
        )
    )
    agg = j.agg(
        F.sum("in_pred").cast("long").alias("n_pred"),
        F.sum("in_truth").cast("long").alias("n_truth"),
        F.sum(F.col("in_pred") * F.col("in_truth")).cast("long").alias("n_hit"),
    )
    return agg.select(
        "n_pred",
        "n_truth",
        "n_hit",
        F.round(
            F.col("n_hit") / F.greatest(F.col("n_pred"), F.lit(1)), 6
        ).alias("prec"),
        F.round(
            F.col("n_hit") / F.greatest(F.col("n_truth"), F.lit(1)), 6
        ).alias("recall"),
        F.round(
            2.0 * F.col("n_hit")
            / F.greatest(F.col("n_pred") + F.col("n_truth"), F.lit(1)),
            6,
        ).alias("f1"),
    )


# --------------------------------------------------------------------------
# Vocabulary reports and unigram-LM scoring
# --------------------------------------------------------------------------

def vocab_top_tokens(
    df: DataFrame,
    text_col: str,
    group_cols: list[str],
    k: int = 5,
) -> DataFrame:
    """Per-group top-k tokens by occurrence count (ties to the earlier
    token) — the vocabulary drift report run per source/shard.  Token
    counting is a map-side-combinable aggregate; the top-k is a window
    over the (small) per-group vocabulary, so the second shuffle moves
    one row per distinct (group, token), never per occurrence."""
    toks = (
        df.select(*group_cols, F.explode(F.split(F.col(text_col), " "))
                  .alias("token"))
        .filter(F.length("token") > 0)
        .groupBy(*group_cols, "token")
        .agg(F.count("*").cast("long").alias("n"))
    )
    w = Window.partitionBy(*group_cols).orderBy(
        F.desc("n"), F.asc("token")
    )
    return (
        toks.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(*group_cols, "token", "n", F.col("rank").cast("int"))
    )


def unigram_logprob(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Per-document mean unigram negative log-probability under the
    corpus's own (add-one-smoothed) unigram distribution — the
    relational stand-in for the LM-perplexity quality filter (CCNet
    style): a document of rare/garbled tokens scores high, boilerplate
    scores low.

    The unigram table is vocabulary-sized, built with one map-side
    combinable aggregate and broadcast back onto the exploded tokens —
    the corpus side shuffles only on doc_id for the final per-doc mean.
    """
    toks = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(F.split(F.col(text_col), " ")).alias("token"))
        .filter(F.length("token") > 0)
    )
    freq = toks.groupBy("token").agg(F.count("*").alias("tf"))
    totals = toks.agg(
        F.count("*").alias("n_total"),
        F.countDistinct("token").alias("n_vocab"),
    )
    # each -ln(p) term is cast to decimal(38,18) BEFORE the sum so the
    # aggregate is summation-order-independent (the repo's cross-engine
    # rule): partial-aggregation order differs from DuckDB's, and a plain
    # double sum could land a 6-dp rounding boundary differently
    term = (
        -F.log((F.col("tf") + 1) / (F.col("n_total") + F.col("n_vocab")))
    ).cast("decimal(38,18)")
    scored = (
        toks.join(F.broadcast(freq), "token")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.round(
                F.sum(term).cast("double") / F.count("*"), 6
            ).alias("mean_neg_logprob"),
        )
    )
    return scored


# --------------------------------------------------------------------------
# Length-distribution quantiles
# --------------------------------------------------------------------------

def length_quantiles(
    df: DataFrame,
    text_col: str,
    group_cols: list[str],
    probs: tuple[float, ...] = (0.25, 0.5, 0.75, 0.9, 0.99),
) -> DataFrame:
    """Per-group EXACT character-length quantiles (linear interpolation,
    the quantile_cont definition both Spark's ``percentile`` and DuckDB
    share bit-for-bit) — the length-distribution report a cutoff-picking
    curation pass reads.

    Scale note: exact ``percentile`` buffers each group's values, which
    is the oracle/report path; for the 100 TB bulk pass swap in
    ``approx_percentile`` (t-digest, bounded memory, same call shape)
    and accept the documented error bound.  Counts and quantiles are all
    one aggregation — a single shuffle on the group key.
    """
    aggs = [F.count("*").cast("long").alias("n_docs")]
    for p in probs:
        aggs.append(
            F.round(
                F.expr(f"percentile(length({text_col}), {p!r})"), 6
            ).alias(f"p{round(p * 100)}")  # round(): int() truncates
                                           # 0.57*100 -> 56 and mislabels
        )
    return df.groupBy(*group_cols).agg(*aggs)


# --------------------------------------------------------------------------
# Feature-hashing vectorizer (hashing trick)
# --------------------------------------------------------------------------

_HASH_MOD = 1_000_000_007  # fits 31*mod + 255 comfortably inside int64


def hash_vectorize(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
) -> DataFrame:
    """Token-count vectors via the hashing trick (Weinberger et al. 2009):
    each token hashes to one of ``dim`` buckets with a 31-ary polynomial
    rolling hash mod 1e9+7 — the same portable hash family the winnowing
    fingerprints use, so the vectorizer is reproducible in any engine
    with integer arithmetic (no murmur/xxhash dependence).

    The whole computation is within-row (split -> per-token fold ->
    per-bucket count), zero shuffle, and the output ``vec`` feeds every
    embedding operator here (cosine pairs, IVF, k-means) — a text-only
    corpus gets the semantic-dedup surface without an external model.

    Emits (id, vec: array<double>) with exact integer counts.
    """
    # drop empty tokens (doubled separators) — an empty fold differs
    # between engines, and an empty token carries no signal anyway
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
    )

    def bucket(tok):
        # polynomial fold over character positions (substr keeps the char
        # enumeration identical across engines; split-on-empty does not)
        chars = F.transform(
            F.sequence(F.lit(1), F.length(tok)),
            lambda i: F.ascii(F.substring(tok, i, F.lit(1))),
        )
        return (
            F.aggregate(
                chars,
                F.lit(0).cast("long"),
                lambda acc, c: (acc * 31 + c) % _HASH_MOD,
            )
            % dim
        )

    buckets = F.transform(toks, bucket)
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda d: F.size(F.filter(buckets, lambda b: b == d.cast("long")))
        .cast("double"),
    )
    return df.select(F.col(id_col).alias("vec_id"), vec.alias("embedding"))


# --------------------------------------------------------------------------
# TF-IDF query ranking
# --------------------------------------------------------------------------

def tfidf_topk(
    docs: DataFrame,
    query: str,
    id_col: str,
    text_col: str,
    k: int = 20,
) -> DataFrame:
    """Rank documents against a query by sum of tf * idf over query terms.

    idf(t) = ln((N + 1) / (df(t) + 1)) + 1  (smoothed; N = corpus size).

    Scale shape: exploded tokens are filtered to the query vocabulary
    *before* any exchange, so both the df aggregation and the per-doc tf
    aggregation shuffle at most |query terms| x |matching docs| rows —
    selectivity lands ahead of the shuffle, and the partial aggregation is
    map-side combinable.  N arrives via a 1-row broadcast cross join (no
    collect()).
    """
    terms = sorted({t for t in query.split(" ") if t})
    toks = F.split(F.col(text_col), " ")
    tok_rows = (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(toks).alias("tok"))
        .filter(F.col("tok").isin(terms))
    )
    tf = tok_rows.groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    df_counts = tf.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )
    n_docs = docs.agg(F.count("*").alias("n_docs"))
    # decimal(38,18) per-term cast: order-independent sum (cross-engine
    # rule; see unigram_logprob)
    term = (
        F.col("tf")
        * (F.log((F.col("n_docs") + 1) / (F.col("df") + 1)) + F.lit(1.0))
    ).cast("decimal(38,18)")
    scored = (
        tf.join(F.broadcast(df_counts), "tok")
        .crossJoin(F.broadcast(n_docs))
        .groupBy("doc_id")
        .agg(
            F.round(F.sum(term).cast("double"), 6).alias("tfidf")
        )
    )
    return (
        scored.orderBy(F.col("tfidf").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", "tfidf")
    )


# --------------------------------------------------------------------------
# C4-style corpus-wide line-level exact deduplication
# --------------------------------------------------------------------------


def line_dedup_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    sep: str = "\n",
    min_chars: int = 1,
) -> DataFrame:
    """Corpus-wide line-level exact dedup (the C4 cleaning rule: any line
    occurring more than once in the corpus is removed everywhere except
    its first occurrence — Raffel et al., arXiv:1910.10683 §2.2).

    Reference analog: the exact-match tier of the scoring cascade
    (`Sources/FuzzyMatch/FuzzyMatcher.swift` phase 1) applied at line
    grain across documents instead of query-vs-candidate.

    Returns one row per document:

    * ``n_lines``      — lines after trim + ``min_chars`` filter
    * ``n_dup_lines``  — lines whose global occurrence count > 1
    * ``kept_lines``   — lines whose first occurrence (ordered by
      ``(id, line_idx)``) is in this document
    * ``dup_line_frac``— ``n_dup_lines / n_lines`` (rounded 6 dp)
    * ``kept_fp``      — md5 of the surviving text (kept lines joined
      with '\\n' in original order; '' when nothing survives), i.e. the
      cleaned document's fingerprint without shipping the cleaned text

    Scale shape: ONE exchange keyed by the 60-bit md5 line fingerprint
    (a single window pass computes the global count and the
    first-occurrence rank together), then one exchange back by doc id
    for the per-document rollup.  Line text rides each exchange at most
    once; keys are md5-derived (engine-portable, never xxhash/murmur —
    cross-engine rule).  Skewed keys (boilerplate lines repeated
    millions of times) bound their partition by the line's occurrence
    count only — the window needs no full sort beyond (id, line_idx)
    within a key — and a density cap analogous to the pHash degree cap
    can pre-drop keys above a count threshold if one line ever dominates
    a partition.
    """
    lines = (
        df.select(
            F.col(id_col).alias("_ld_id"),
            F.posexplode(F.split(F.col(text_col), sep)).alias(
                "line_idx", "line_raw"
            ),
        )
        .select(
            "_ld_id", "line_idx", F.trim(F.col("line_raw")).alias("line")
        )
        .filter(F.length("line") >= min_chars)
        .withColumn(
            "lkey",
            F.conv(F.substring(F.md5(F.col("line")), 1, 15), 16, 10).cast(
                "long"
            ),
        )
    )
    w_all = Window.partitionBy("lkey")
    w_ord = Window.partitionBy("lkey").orderBy("_ld_id", "line_idx")
    marked = lines.select(
        "_ld_id",
        "line_idx",
        "line",
        F.count(F.lit(1)).over(w_all).alias("n_occ"),
        (F.row_number().over(w_ord) == 1).alias("keeper"),
    )
    kept_struct = F.when(
        F.col("keeper"), F.struct(F.col("line_idx"), F.col("line"))
    )
    return (
        marked.groupBy(F.col("_ld_id").alias(id_col))
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(F.when(F.col("n_occ") > 1, 1).otherwise(0)).alias(
                "n_dup_lines"
            ),
            F.sum(F.when(F.col("keeper"), 1).otherwise(0)).alias(
                "kept_lines"
            ),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(kept_struct)),
                        lambda x: x["line"],
                    ),
                    "\n",
                )
            ).alias("kept_fp"),
        )
        .withColumn(
            "dup_line_frac",
            F.round(F.col("n_dup_lines") / F.col("n_lines"), 6),
        )
    )


# --------------------------------------------------------------------------
# DSIR-style data selection via importance resampling
# --------------------------------------------------------------------------

def dsir_select(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target,
    dim: int = 256,
    alpha: float = 1.0,
    k: int = 100,
    seed: int = 0,
) -> DataFrame:
    """Data Selection via Importance Resampling (Xie et al.,
    arXiv:2302.03169): pick the ``k`` raw-pool documents whose hashed
    n-gram feature distribution looks most like a target domain, via
    Gumbel-top-k sampling on importance log-weights.

    * Features: unigrams + adjacent-token bigrams, hashed into ``dim``
      buckets with the portable 31-ary polynomial hash (mod 1e9+7) the
      winnowing / hashing-trick operators already use — reproducible in
      any engine with integer arithmetic.
    * Bucket distributions: Laplace-smoothed counts over the target rows
      (``target`` boolean column expression) and over the whole pool,
      p(b) = (cnt_b + alpha) / (total + alpha * dim).
    * Per-doc log-weight: sum over feature OCCURRENCES of
      ln p_target(bucket) - ln p_raw(bucket), each term cast to
      decimal(38,18) before the SUM (order-independent, cross-engine —
      the same rule as unigram_logprob; a within-row fold can't be used
      here because Spark's decimal ``+`` narrows the scale to (38,17)
      while SUM preserves it).
    * Sampling key: logw + Gumbel noise g = -ln(-ln(u)) with u the
      md5-fraction of ``seed:doc_id`` — deterministic, engine-portable,
      and distributed exactly as Gumbel(0,1), so top-k by key IS a
      weighted sample without replacement (Gumbel-max trick).

    Scale shape (mirrors unigram_logprob): the bucket-count aggregation
    is map-side combinable partials onto <= ``dim`` rows; the per-bucket
    log-ratio table is broadcast back onto the exploded features, and
    the per-doc weight shuffles only map-side-combined (doc_id) partials.
    The final top-k is a TakeOrdered, not a global sort.

    Returns the selected rows: (doc_id, is_target, logw, sample_key),
    sample_key descending, ties by doc_id.
    """
    if dim <= 0 or k <= 0 or alpha <= 0:
        raise ValueError("dim, k and alpha must be positive")

    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
    )

    def bucket(tok):
        chars = F.transform(
            F.sequence(F.lit(1), F.length(tok)),
            lambda i: F.ascii(F.substring(tok, i, F.lit(1))),
        )
        return (
            F.aggregate(
                chars,
                F.lit(0).cast("long"),
                lambda acc, c: (acc * 31 + c) % _HASH_MOD,
            )
            % dim
        )

    # unigram + adjacent-bigram feature buckets, computed once within-row.
    # Guard the <2-token case explicitly: Spark's sequence(1, 0) counts
    # DOWN ([1, 0]), it is not empty like DuckDB's range(1, 1).
    bigrams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = F.transform(F.concat(toks, bigrams), bucket)

    base = df.select(
        F.col(id_col).alias("doc_id"),
        F.coalesce(target.cast("boolean"), F.lit(False)).alias("is_target"),
        feats.alias("feats"),
    )

    # ONE exchange: per-bucket (raw, target) occurrence counts
    counts = (
        base.select("is_target", F.explode("feats").alias("b"))
        .groupBy("b")
        .agg(
            F.count("*").alias("raw_cnt"),
            F.sum(F.col("is_target").cast("long")).alias("tgt_cnt"),
        )
    )
    # smoothed log-ratio per bucket; totals via a 1-row broadcast
    totals = counts.agg(
        F.sum("raw_cnt").alias("raw_tot"), F.sum("tgt_cnt").alias("tgt_tot")
    )
    a = F.lit(float(alpha))
    ad = F.lit(float(alpha * dim))
    lw = (
        F.log((F.col("tgt_cnt") + a) / (F.col("tgt_tot") + ad))
        - F.log((F.col("raw_cnt") + a) / (F.col("raw_tot") + ad))
    ).alias("lw")
    lw_tbl = counts.crossJoin(F.broadcast(totals)).select("b", lw)

    # per-doc decimal sum over feature occurrences; docs with zero
    # features rejoin with logw = 0 (mirrors the oracle's LEFT JOIN)
    occ = base.select("doc_id", F.explode("feats").alias("b"))
    dw = (
        occ.join(F.broadcast(lw_tbl), "b")
        .groupBy("doc_id")
        .agg(
            F.sum(F.col("lw").cast("decimal(38,18)")).alias("logw_dec")
        )
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":", F.lit(str(seed)), F.col("doc_id").cast("string")
                    ).cast("binary")
                ),
                1,
                12,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(float(16**12))
    )
    gumbel = -F.log(-F.log(u))
    scored = (
        base.select("doc_id", "is_target")
        .join(dw, "doc_id", "left")
        .select(
            "doc_id",
            "is_target",
            F.coalesce(
                F.col("logw_dec").cast("double"), F.lit(0.0)
            ).alias("logw_raw"),
            gumbel.alias("g"),
        )
        .select(
            "doc_id",
            "is_target",
            F.round("logw_raw", 6).alias("logw"),
            F.round(F.col("logw_raw") + F.col("g"), 6).alias("sample_key"),
        )
    )
    return scored.orderBy(
        F.col("sample_key").desc(), F.col("doc_id")
    ).limit(k)


# --------------------------------------------------------------------------
# Okapi BM25 query ranking
# --------------------------------------------------------------------------

def bm25_topk(
    docs: DataFrame,
    query: str,
    id_col: str,
    text_col: str,
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Rank documents against a query with Okapi BM25 (Robertson et al.,
    TREC-3) — the standard retrieval scorer for retrieval-based benchmark
    decontamination, complementing ``tfidf_topk`` with tf saturation
    (``k1``) and document-length normalization (``b``):

        idf(t)  = ln((N - df + 0.5) / (df + 0.5) + 1)
        s(D, t) = idf(t) * tf * (k1 + 1) / (tf + k1 * (1 - b + b*dl/avgdl))

    Scale shape (same as tfidf_topk): the document length ``dl`` is
    computed WITHIN-ROW and rides the token rows, which are filtered to
    the query vocabulary *before* any exchange; df and the per-doc score
    are map-side-combinable aggregates; N and avgdl arrive via a 1-row
    broadcast (exact long token sum / long count — no floating-point
    accumulation).  Per-term scores cast to decimal(38,18) before the
    sum (cross-engine order independence), rounded to 6 dp after.
    """
    terms = sorted({t for t in query.split(" ") if t})
    if not terms:
        raise ValueError("bm25_topk: query has no terms")
    toks = F.filter(
        F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
    )
    tok_rows = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(toks).cast("long").alias("dl"),
            F.explode(toks).alias("tok"),
        )
        .filter(F.col("tok").isin(terms))
    )
    # dl is constant per doc, so keying the aggregate on it is free
    tf = tok_rows.groupBy("doc_id", "dl", "tok").agg(
        F.count("*").alias("tf")
    )
    df_counts = tf.groupBy("tok").agg(
        F.countDistinct("doc_id").alias("df")
    )
    stats = docs.select(F.size(toks).cast("long").alias("dl0")).agg(
        F.count("*").alias("n_docs"),
        F.sum("dl0").alias("dl_sum"),
    )
    avgdl = F.col("dl_sum").cast("double") / F.col("n_docs")
    idf = F.log(
        (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    term = (
        idf
        * (F.col("tf") * (k1 + 1.0))
        / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl))
    ).cast("decimal(38,18)")
    scored = (
        tf.join(F.broadcast(df_counts), "tok")
        .crossJoin(F.broadcast(stats))
        .groupBy("doc_id")
        .agg(F.round(F.sum(term).cast("double"), 6).alias("bm25"))
    )
    return (
        scored.orderBy(F.col("bm25").desc(), F.col("doc_id"))
        .limit(k)
        .select("doc_id", "bm25")
    )


# --------------------------------------------------------------------------
# fuzzy (MinHash-LSH) benchmark decontamination
# --------------------------------------------------------------------------

def decontaminate_fuzzy(
    docs: DataFrame,
    benchmark: DataFrame,
    id_col: str,
    text_col: str,
    cfg=None,
    jaccard_pct: int = 98,
    sig_docs: DataFrame | None = None,
    sig_bench: DataFrame | None = None,
) -> DataFrame:
    """Flag training docs NEAR-duplicate to a benchmark doc.

    Exact n-gram decontamination (``decontaminate_ngrams``) misses eval
    rows that were lightly paraphrased or re-tokenized before leaking into
    the crawl; the standard remedy (GPT-3 appendix C's 13-gram overlap is
    the exact tier; Llama/FineWeb-style pipelines add a fuzzy tier) is a
    near-dup join between corpus and benchmark.  This operator reuses the
    engine's dedup machinery asymmetrically:

    1. character-shingle MinHash signatures for both sides (one fused
       Arrow UDF pass each, ``operators/dedup.py:compute_signatures``);
    2. banded-LSH candidate generation — but where the self-join dedup
       needs a shuffle, the benchmark side here is SMALL by construction
       (eval suites are MBs, the corpus is TBs), so its band keys are
       explicitly ``broadcast()``: the corpus side is scan -> in-task
       band explode -> broadcast-hash join, NO corpus shuffle;
    3. exact trigram-Jaccard verification on the stored distinct-shingle
       arrays (``array_intersect`` in whole-stage codegen — the same
       JVM tier ``verify_edges`` uses), keeping a pair only when
       ``100 * |inter| >= jaccard_pct * |union|``;
    4. per-doc rollup: only verified-hit rows (a tiny stream) reach the
       final groupBy.

    A corpus doc that IS a benchmark doc (shared id) never matches
    itself — real deployments have disjoint sides; when the benchmark is
    carved out of the corpus (the driver entry), self-pairs are noise.

    Returns (doc_id, fuzzy_hits, fuzzy_contaminated) for every input doc:
    fuzzy_hits = number of distinct benchmark docs verified >= the
    threshold; fuzzy_contaminated = 1 when fuzzy_hits > 0.
    """
    from fuzzymatch_spark.config import DedupConfig
    from fuzzymatch_spark.operators.dedup import (
        compute_signatures,
        minhash_bands,
    )

    cfg = cfg or DedupConfig()
    sig_cols = ["id", "shingles", "n_shingles"]
    # at pipeline scale pass the CHECKPOINTED signature tables via
    # sig_docs/sig_bench (the dedup pipeline already materializes them to
    # parquet): their lineage is then a plain scan and the signature UDF
    # never runs here.  The self-computing default persists lazily
    # instead — each side's UDF evaluates ONCE and the band and verify
    # branches share the cache (without it, lineage re-evaluation runs
    # the fused UDF per branch per extracted column: 8 Arrow stages
    # measured for this operator's 4 signature references).
    if sig_docs is None:
        sig_docs = compute_signatures(docs, id_col, text_col, cfg).persist()
    if sig_bench is None:
        sig_bench = compute_signatures(
            benchmark, id_col, text_col, cfg
        ).persist()

    # zero-shingle rows all share the sentinel MinHash signature, so
    # leaving them in the band tables would cross-join every degenerate
    # corpus row with every degenerate bench row (guaranteed discards —
    # an empty shingle set has no defined Jaccard).  Filter BEFORE
    # banding on both sides; the union > 0 verify guard below stays as
    # defense in depth.
    bands_docs = minhash_bands(
        sig_docs.filter(F.col("n_shingles") > 0), cfg
    ).select("id", "key")
    bands_bench = minhash_bands(
        sig_bench.filter(F.col("n_shingles") > 0), cfg
    ).select(F.col("id").alias("bench_id"), "key")
    cand = (
        bands_docs.join(F.broadcast(bands_bench), "key")
        .filter(F.col("id") != F.col("bench_id"))
        .select("id", "bench_id")
        .distinct()
    )

    bench_side = F.broadcast(
        sig_bench.select(
            F.col("id").alias("bench_id"),
            F.col("shingles").alias("shingles_b"),
            F.col("n_shingles").alias("nb"),
        )
    )
    inter = F.size(F.array_intersect("shingles", "shingles_b"))
    union = F.col("n_shingles") + F.col("nb") - inter
    # union > 0 guards the degenerate zero-shingle pair (text shorter
    # than one shingle on both sides): MinHash sentinel signatures would
    # band-collide and 0 >= 0 would verify vacuously — but an empty
    # shingle set has no defined Jaccard and is never a real dup.
    # cand is bounded by bench band-collisions (the same assumption that
    # makes the bench side broadcastable), so it is explicitly broadcast
    # and the CORPUS side is the streaming probe — without the hint,
    # plan-time size estimates from the UDF lineage exceed the
    # auto-broadcast threshold at scale and Spark would shuffle every
    # corpus shingle array into a SortMergeJoin on id.
    verified = (
        sig_docs.select(*sig_cols)
        .join(F.broadcast(cand), "id")
        .join(bench_side, "bench_id")
        .filter((union > 0) & (100 * inter >= int(jaccard_pct) * union))
        .select("id", "bench_id")
    )
    hits = verified.groupBy("id").agg(
        F.count("*").cast("long").alias("fuzzy_hits")
    )
    # hits is bounded by the contaminated-doc count (a small fraction by
    # the same assumption that makes the bench side broadcastable), so
    # the final full-grain left join broadcasts it too: the corpus side
    # never shuffles anywhere in this operator
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(
            F.broadcast(hits.withColumnRenamed("id", "doc_id")),
            "doc_id", "left",
        )
        .select(
            "doc_id",
            F.coalesce("fuzzy_hits", F.lit(0)).alias("fuzzy_hits"),
            F.when(F.coalesce("fuzzy_hits", F.lit(0)) > 0, 1)
            .otherwise(0)
            .cast("int")
            .alias("fuzzy_contaminated"),
        )
    )


# --------------------------------------------------------------------------
# interpolated bigram LM perplexity (CCNet-style quality filter)
# --------------------------------------------------------------------------

def bigram_logprob(
    df: DataFrame, id_col: str, text_col: str, lam: float = 0.8
) -> DataFrame:
    """Per-document mean negative log-probability under an interpolated
    bigram LM trained on the corpus itself — the bigram upgrade of
    ``unigram_logprob`` (CCNet, Wenzek et al. 1911.00359, filters on LM
    perplexity; Jelinek-Mercer interpolation keeps unseen bigrams finite):

        P(w2 | w1) = lam * c(w1 w2) / c(w1)
                   + (1 - lam) * (c(w2) + 1) / (T + V)

    Scale shape: unigram counts are vocabulary-sized (broadcast, twice:
    the conditional's denominator on w1 and the backoff on w2); the
    bigram-count table can exceed broadcast size, so the bigram rows
    join it on the (w1, w2) key — a map-side-combinable build plus one
    distributed equi-join, then one exchange on doc_id for the per-doc
    mean.  Each -ln(p) term casts to decimal(38,18) before the sum
    (summation-order independence across engines), 6-dp round after.

    Returns (doc_id, n_bigrams, mean_neg_logprob_bi) for every doc with
    >= 2 tokens; docs with fewer have no bigram positions and no row
    (callers left-join and decide the fill, as the driver entry does).
    """
    one_m_lam = 1.0 - float(lam)
    toks_arr = F.filter(
        F.split(F.col(text_col), " "), lambda t: F.length(t) > 0
    )
    base = df.select(F.col(id_col).alias("doc_id"), toks_arr.alias("toks"))
    uni = base.select(F.explode("toks").alias("token"))
    freq = uni.groupBy("token").agg(F.count("*").alias("tf"))
    totals = uni.agg(
        F.count("*").alias("n_total"),
        F.countDistinct("token").alias("n_vocab"),
    )
    pair_structs = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.struct(
                F.element_at("toks", i).alias("w1"),
                F.element_at("toks", i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    bigrams = base.select(
        "doc_id", F.explode(pair_structs).alias("bg")
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bfreq = bigrams.groupBy("w1", "w2").agg(F.count("*").alias("bf"))

    c1 = freq.select(F.col("token").alias("w1"), F.col("tf").alias("c1"))
    c2 = freq.select(F.col("token").alias("w2"), F.col("tf").alias("c2"))
    p2 = (F.col("c2") + 1) / (F.col("n_total") + F.col("n_vocab"))
    cond = F.col("bf") / F.col("c1")
    term = (-F.log(lam * cond + one_m_lam * p2)).cast("decimal(38,18)")
    return (
        bigrams.join(bfreq, ["w1", "w2"])
        .join(F.broadcast(c1), "w1")
        .join(F.broadcast(c2), "w2")
        .crossJoin(F.broadcast(totals))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.round(
                F.sum(term).cast("double") / F.count("*"), 6
            ).alias("mean_neg_logprob_bi"),
        )
    )


# --------------------------------------------------------------------------
# UniMax language-sampling allocation
# --------------------------------------------------------------------------

def unimax_alloc(
    df: DataFrame,
    group_col: str,
    text_col: str,
    budget_tokens: int | None = None,
    max_epochs: int = 2,
) -> DataFrame:
    """UniMax-style sampling allocation across languages/domains (Chung
    et al., "UniMax: Fairer and More Effective Language Sampling for
    Large-Scale Multilingual Pretraining", ICLR 2023): spread a token
    budget as uniformly as possible over groups, capping every group at
    ``max_epochs``x its available tokens so low-resource groups are never
    over-repeated.

    The allocation is the exact waterfill solution of
    ``maximize uniformity s.t. sum(alloc) == budget, alloc_g <= cap_g``
    computed in CLOSED FORM with window functions — no driver loop:
    sort groups by capacity ascending; group i (1-based, of L) saturates
    iff ``cap_i * (L - i + 1) + prefix_{i-1} <= budget`` (giving every
    not-yet-saturated group cap_i each still fits); non-saturated groups
    share the remaining budget equally at the water level
    ``theta = (budget - prefix_sat) / (L - n_sat)``.

    Scale shape: ONE map-side-combinable aggregate onto |groups| rows
    (token counts computed within-row before the exchange), then O(L)
    window arithmetic — at 100 TB the corpus is touched exactly once.
    Token counts and prefix sums stay exact integers; only the water
    level is floating point (identical int->double expression on both
    engines).

    ``budget_tokens=None`` defaults to half the corpus's total tokens
    (floor division — exact on both engines).

    Returns one row per group: (group, n_docs, n_tokens, cap_tokens,
    alloc_tokens, sample_rate), alloc/rate rounded to 6 dp;
    sample_rate = alloc / n_tokens can exceed 1 up to ``max_epochs``
    (repetition of low-resource groups).
    """
    if max_epochs < 1:
        raise ValueError("unimax_alloc: max_epochs must be >= 1")
    if budget_tokens is not None and budget_tokens < 0:
        raise ValueError("unimax_alloc: budget_tokens must be >= 0")
    n_toks = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda t: F.length(t) > 0)
    ).cast("long")
    per = (
        df.select(F.col(group_col).alias("grp"), n_toks.alias("nt"))
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("nt").alias("n_tokens"),
        )
        .withColumn("cap_tokens", F.col("n_tokens") * int(max_epochs))
    )
    # default budget = half the total tokens, attached as a 1-row
    # broadcast (exact BIGINT floor division) — no driver action, the
    # whole operator stays one lazy plan
    if budget_tokens is not None:
        budget = F.lit(int(budget_tokens))
        per2 = per
    else:
        budget = F.col("_budget")
        per2 = per.crossJoin(
            F.broadcast(
                per.agg(
                    # shiftright = exact integer floor-halving at any
                    # magnitude (x/2 would round-trip through double)
                    F.shiftright(F.sum("n_tokens"), 1).alias("_budget")
                )
            )
        )

    # |groups| rows: the single-partition windows below are O(L), not a
    # corpus-scale sort (L = languages/domains, thousands at most)
    w_ord = Window.orderBy("cap_tokens", "grp")
    w_pre = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    ranked = (
        per2.withColumn("i", F.row_number().over(w_ord))
        .withColumn(
            "prefix",
            F.coalesce(F.sum("cap_tokens").over(w_pre), F.lit(0)),
        )
        .withColumn("L", F.count("*").over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ))
        .withColumn(
            "saturated",
            (
                F.col("cap_tokens") * (F.col("L") - F.col("i") + 1)
                + F.col("prefix")
                <= budget
            ).cast("int"),
        )
    )
    w_all = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    leveled = ranked.withColumn(
        "n_sat", F.sum("saturated").over(w_all)
    ).withColumn(
        "sat_sum",
        F.coalesce(
            F.sum(
                F.when(F.col("saturated") == 1, F.col("cap_tokens"))
            ).over(w_all),
            F.lit(0),
        ),
    ).withColumn(
        "theta",
        F.when(
            F.col("n_sat") < F.col("L"),
            (budget - F.col("sat_sum"))
            / (F.col("L") - F.col("n_sat")),
        ),
    )
    alloc = F.when(
        F.col("saturated") == 1, F.col("cap_tokens").cast("double")
    ).otherwise(F.col("theta"))
    return leveled.select(
        F.col("grp").alias(group_col),
        "n_docs",
        "n_tokens",
        "cap_tokens",
        F.round(alloc, 6).alias("alloc_tokens"),
        # zero-token group (all-empty docs): rate pinned to 0.0, not 0/0
        F.round(
            F.when(F.col("n_tokens") > 0, alloc / F.col("n_tokens"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("sample_rate"),
    )


# --------------------------------------------------------------------------
# token-budget greedy selection
# --------------------------------------------------------------------------

def budget_fill(
    df: DataFrame,
    id_col: str,
    text_col: str,
    score_col: str,
    budget_tokens: int,
    part_cols: list[str],
) -> DataFrame:
    """Fill a per-stratum token budget with the highest-scoring docs.

    The selection step of a curation pipeline once every doc has a
    quality score (``quality_score``, ``unigram_logprob``/``bigram_logprob``,
    DSIR weights, a model score...): within each stratum rank docs by
    score descending (ties by md5 of the id, then id — portable and
    deterministic) and keep the ranked PREFIX whose running token total
    fits the budget.  Greedy-prefix semantics, not knapsack: the first
    doc that overflows is dropped and later (smaller) docs are NOT
    reconsidered — selection is monotone in the budget and stable under
    corpus growth below the cutoff, which resampling-style selection is
    not.

    ``part_cols`` is required: the ranking is a per-stratum window
    (language/source shards), never a global sort.  Scale notes: one
    exchange on the stratum key; token counts are computed within-row
    before it; a single giant stratum serializes its own window — shard
    it upstream (the ``pack_chunks`` contract) or pre-filter with a
    score-quantile cutoff and run the window on survivors only.

    Returns one row per input doc: (doc_id, *part_cols, n_tokens,
    score, rank, cum_tokens, selected).
    """
    if not part_cols:
        raise ValueError(
            "budget_fill: part_cols required (a global sort would not "
            "scale)"
        )
    if budget_tokens < 0:
        raise ValueError("budget_fill: budget_tokens must be >= 0")
    n_toks = F.size(
        F.filter(F.split(F.col(text_col), " "), lambda t: F.length(t) > 0)
    ).cast("long")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        *[F.col(c) for c in part_cols],
        F.col(score_col).alias("score"),
        n_toks.alias("n_tokens"),
    )
    w = Window.partitionBy(*part_cols).orderBy(
        F.desc("score"),
        F.md5(F.col("doc_id").cast("string")),
        F.col("doc_id"),
    )
    ranked = base.withColumn(
        "rank", F.row_number().over(w).cast("long")
    ).withColumn(
        "cum_tokens",
        F.sum("n_tokens").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return ranked.select(
        "doc_id",
        *part_cols,
        "n_tokens",
        "score",
        "rank",
        "cum_tokens",
        (F.col("cum_tokens") <= int(budget_tokens))
        .cast("int")
        .alias("selected"),
    )
