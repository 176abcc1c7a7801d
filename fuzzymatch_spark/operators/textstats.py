"""Text-analysis operators for training-data pipelines.

All of these are pure column expressions (JVM-side, whole-stage codegen) —
no Python in any hot path.  Each has a DuckDB-expressible oracle in
``__spark_entry__.oracle_sql``.

* token stats / quality ratios — length, token counts, type-token ratio
* token-sorted exact dedup   — catches token-reordered duplicates
  (FIXTURES.md §4 'token-reordered caption' variant)
* md5 document fingerprint   — 60-bit fingerprint + band decomposition
* language ID                — n-gram/stopword heuristic (pandas-free)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    toks = F.split(F.col(text_col), " ")
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).cast("long").alias("n_chars"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct_tokens"),
        F.round(
            F.size(F.array_distinct(toks)) / F.size(toks), 6
        ).alias("type_token_ratio"),
    )


_EN_STOPWORDS = ["the", "and", "of", "is", "to", "a", "in", "it", "that"]


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Quality heuristics for training-data filtering: length band, TTR,
    mean token length, punctuation ratio (non-alphanumeric-non-space chars
    per char), and stopword ratio (English-marker tokens per token) — all
    pure column expressions, DuckDB-reproducible."""
    toks = F.split(F.col(text_col), " ")
    n_tokens = F.size(toks)
    mean_tok = (F.length(text_col) - n_tokens + 1) / n_tokens
    ttr = F.size(F.array_distinct(toks)) / n_tokens
    n_punct = F.length(
        F.regexp_replace(F.col(text_col), "[A-Za-z0-9 ]", "")
    )
    punct_ratio = n_punct / F.greatest(F.length(text_col), F.lit(1))
    stop_ratio = F.size(
        F.filter(F.transform(toks, lambda t: F.lower(t)),
                 lambda t: t.isin(_EN_STOPWORDS))
    ) / n_tokens
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.round(ttr, 6).alias("ttr"),
        F.round(mean_tok, 6).alias("mean_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        (
            (F.length(text_col) >= 20)
            & (F.length(text_col) <= 10000)
            & (ttr >= 0.2)
        ).cast("int").alias("quality_pass"),
    )


def token_sorted_key(text_col: str):
    return F.array_join(F.sort_array(F.split(F.col(text_col), " ")), " ")


def token_sorted_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup modulo token order: canonical id + group size per group
    with >1 member (corpus-scale exact-match fast path on a canonical key)."""
    return (
        df.select(F.col(id_col).alias("doc_id"), token_sorted_key(text_col).alias("key"))
        .groupBy("key")
        .agg(
            F.min("doc_id").alias("canonical_id"),
            F.count("*").cast("long").alias("group_size"),
        )
        .filter(F.col("group_size") > 1)
        .select("canonical_id", "group_size")
    )


def md5_fingerprint64(text_col):
    """60-bit fingerprint from the md5 hex prefix — identical SQL exists in
    DuckDB (``('0x' || substr(md5(x),1,15))::BIGINT``).  Accepts a column
    name or a Column expression (the ONE definition of the engine's
    oracle-portable hash — never reimplement inline)."""
    col = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def fingerprint_bands(
    df: DataFrame, id_col: str, text_col: str, n_bands: int = 4, width: int = 15
) -> DataFrame:
    """Band decomposition of the 60-bit fingerprint (the Hamming-band join
    key schedule, cross-engine checkable)."""
    fp = md5_fingerprint64(text_col)
    rows = df.select(F.col(id_col).alias("doc_id"), fp.alias("fp"))
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("fp"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for i in range(n_bands)
        ]
    )
    return rows.select(
        "doc_id", F.explode(bands).alias("bk")
    ).select("doc_id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))


# --- language ID: stopword-hit heuristic --------------------------------
_LANG_MARKERS = {
    "en": ["the", "and", "of", "is", "to"],
    "es": ["el", "la", "los", "que", "de"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "les", "des", "est", "une"],
}


def lang_id(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Stopword-count language ID over whitespace tokens; 'und' (undetermined)
    when no marker hits.  Pure column expressions."""
    toks = F.split(F.lower(F.col(text_col)), " ")
    scores = {
        lang: F.size(
            F.filter(toks, lambda t: t.isin(markers))
        )
        for lang, markers in _LANG_MARKERS.items()
    }
    best = F.greatest(*scores.values())
    pred = F.when(best <= 0, F.lit("und"))
    for lang in _LANG_MARKERS:  # deterministic tie-break: dict order
        pred = pred.when(scores[lang] == best, F.lit(lang))
    out = df.select(
        F.col(id_col).alias("doc_id"),
        *[scores[lang].cast("long").alias(f"score_{lang}") for lang in _LANG_MARKERS],
        pred.alias("pred_lang"),
    )
    return out


# --- BPE-style pre-tokenization (GPT-2-shaped regex) ---------------------
# The standard byte-pair-encoding PRE-tokenizer splits text into
# contraction suffixes, (space-prefixed) letter runs, digit runs,
# punctuation runs, and residual whitespace BEFORE the merge table runs —
# token COUNTS from this split are the practical "how many BPE tokens,
# roughly" estimator a training pipeline budgets with (the merge table
# only ever merges WITHIN these pieces, so the piece count lower-bounds
# and tracks the true token count).  The pattern uses only portable
# constructs (alternation, classes, non-capturing groups) so Java regex
# (Spark) and RE2 (DuckDB) agree — cross-engine oracle-checked.
_BPE_PRETOKEN_RE = (
    "'(?:s|t|re|ve|m|ll|d)"
    "| ?[A-Za-z]+"
    "| ?[0-9]+"
    "| ?[^A-Za-z0-9 ]+"
    "| +"
)


def bpe_token_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-doc BPE-ish pre-token counts: total pieces, letter-run pieces,
    digit-run pieces — all JVM-side (`regexp_extract_all`, whole-stage
    codegen), no tokenizer library needed."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(_BPE_PRETOKEN_RE), 0)
    alpha = F.filter(toks, lambda t: t.rlike("^ ?[A-Za-z]+$"))
    digit = F.filter(toks, lambda t: t.rlike("^ ?[0-9]+$"))
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.size(toks).cast("long").alias("n_bpe_pieces"),
        F.size(alpha).cast("long").alias("n_alpha_pieces"),
        F.size(digit).cast("long").alias("n_digit_pieces"),
    )


# --- PII-ish masking (emails / URLs / long digit runs) -------------------
# Training-data hygiene pass: replace matches with stable placeholder
# tokens and count what was masked.  Patterns deliberately use only the
# Java-regex/RE2-common subset so the operator is cross-engine checkable;
# a production pipeline would extend the pattern table, not the plan.
_PII_PATTERNS = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}", "<EMAIL>"),
    ("url", "https?://[^ ]+", "<URL>"),
    ("longnum", "[0-9]{7,}", "<NUM>"),
]


def mask_pii(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, masked_text, n_email, n_url, n_longnum): placeholder
    substitution + per-category match counts, all JVM regexp functions in
    one projection (no Python, no extra pass per category)."""
    masked = F.col(text_col)
    counts = []
    for name, pat, repl in _PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(masked, F.lit(pat), 0))
            .cast("long").alias(f"n_{name}")
        )
        masked = F.regexp_replace(masked, pat, repl)
    return df.select(
        F.col(id_col).alias("doc_id"),
        *counts,
        masked.alias("masked_text"),
    )


def simhash64_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Token-level 60-bit SimHash (Charikar) as PURE COLUMN EXPRESSIONS:
    md5-derived 60-bit token fingerprints (the ``md5_fingerprint64``
    scheme), per-bit majority vote over the doc's tokens (with
    multiplicity), bit set iff the vote is positive.

    This is the cross-engine-checkable twin of the seeded-blake2b SimHash
    inside the signature UDF (`fuzzymatch_spark/functions/udfs.py`): same
    algorithm family, but every step is JVM/DuckDB-reproducible, so the
    SimHash pipeline (signature -> Hamming band join) gets a relational
    oracle.  Scale shape: one explode + one 60-expression groupBy —
    map-side partial aggregation, no Python, output is 12 bytes/doc.
    """
    toks = (
        df.select(
            F.col(id_col).alias("doc_id"),
            F.explode(F.split(F.col(text_col), " ")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .withColumn("fp", md5_fingerprint64("tok"))
    )
    votes = [
        F.sum(
            F.when(
                F.shiftrightunsigned("fp", k).bitwiseAND(F.lit(1)) == 1, 1
            ).otherwise(-1)
        ).alias(f"v{k}")
        for k in range(60)
    ]
    agg = toks.groupBy("doc_id").agg(*votes)
    sh = F.lit(0).cast("long")
    for k in range(60):
        sh = sh.bitwiseOR(
            F.when(
                F.col(f"v{k}") > 0,
                F.shiftleft(F.lit(1).cast("long"), k),
            ).otherwise(F.lit(0).cast("long"))
        )
    return agg.select("doc_id", sh.alias("simhash"))


# --- URL canonicalization (web-corpus URL-level dedup) -------------------
_URL_PREFIX_PAT = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?]*)"
_URL_TRACKING_PAT = r"^(utm_[a-z]+|gclid|fbclid)="


def normalize_urls(df: DataFrame, id_col: str, url_col: str) -> DataFrame:
    """Canonical URL form for URL-level exact dedup — the FIRST dedup
    pass of web-corpus pipelines (C4/CCNet drop refetches of the same
    page before any content work).  Canonicalization steps:

      1. strip the fragment (``#...`` never reaches the server)
      2. lowercase the scheme + authority (case-insensitive per RFC 3986;
         path/query case is PRESERVED — it is significant)
      3. strip default ports (``:80`` http, ``:443`` https)
      4. drop tracking query params (``utm_*``, ``gclid``, ``fbclid``)
      5. sort surviving query params (param order is almost never
         significant; sorting makes the form order-insensitive)
      6. drop an empty leftover query

    Assumes absolute URLs (scheme-less inputs pass through with only the
    query/fragment steps applied).  Everything is JVM column expressions
    — zero shuffle, fuses into the scan; at 100 TB this is a pure map
    stage like the other signature computations.

    Returns (doc_id, url_norm, url_key) where url_key = md5 hex of the
    canonical form (the engine-portable join/groupBy key — URL-level
    exact dedup is then ``exact_dup_edges`` / a groupBy on url_key).
    """
    t = df.select(
        F.col(id_col).alias("doc_id"),
        F.substring_index(F.col(url_col), "#", 1).alias("nf"),
    )
    t = t.withColumn(
        "prefix", F.regexp_extract("nf", _URL_PREFIX_PAT, 1)
    ).withColumn("rest", F.expr("substring(nf, length(prefix) + 1)"))
    pfx = F.lower(F.col("prefix"))
    # `.+` (not `[^:/]+`): authorities may contain ':' themselves
    # (userinfo passwords, IPv6 literals) — the port is whatever trails
    # the LAST colon, and a `:443$` suffix can only be the port
    pfx = F.regexp_replace(pfx, r"^(http://.+):80$", "$1")
    pfx = F.regexp_replace(pfx, r"^(https://.+):443$", "$1")
    path = F.substring_index(F.col("rest"), "?", 1)
    qs = F.when(
        F.instr("rest", "?") > 0,
        F.expr("substring(rest, instr(rest, '?') + 1)"),
    ).otherwise(F.lit(""))
    keep = F.filter(
        F.split(qs, "&"),
        lambda p: (F.length(p) > 0) & ~p.rlike(_URL_TRACKING_PAT),
    )
    canon_qs = F.array_join(F.array_sort(keep), "&")
    url_norm = F.concat(
        pfx,
        path,
        F.when(F.length(canon_qs) > 0, F.concat(F.lit("?"), canon_qs))
        .otherwise(F.lit("")),
    )
    return t.select(
        "doc_id",
        url_norm.alias("url_norm"),
        F.md5(url_norm).alias("url_key"),
    )
