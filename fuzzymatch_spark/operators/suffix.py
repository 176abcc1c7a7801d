"""Exact repeated-substring (boilerplate) detection.

Engine-only stage required by the north rule (SURVEY.md §2.10): detect
caption pairs sharing an exact run of >= L characters.  Conceptual ancestor:
the reference's exact-substring early exit
(`Sources/FuzzyMatch/EditDistance.swift:258-261`).

Relational formulation: explode every length-L substring (optionally
*winnowed*: keep only substrings whose hash ≡ 0 (mod k)) -> equi-join on the
substring -> distinct pairs.  With winnowing the emitted-row count drops by
k× while any shared run of length >= L + k - 1 is still guaranteed to share
a sampled window (standard winnowing/minimizer argument) — that is the
10^12-row path.  ``winnow_k=1`` is the exact small-scale/oracle path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def substring_windows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    run_len: int = 32,
    winnow_k: int = 1,
) -> DataFrame:
    """(id, sub) for each distinct length-``run_len`` window (winnowed)."""
    idxs = F.sequence(
        F.lit(1), F.greatest(F.length("t") - F.lit(run_len - 1), F.lit(0))
    )
    out = (
        df.select(F.col(id_col).alias("id"), F.col(text_col).alias("t"))
        .filter(F.length("t") >= run_len)
        .select(
            "id",
            F.explode(
                F.array_distinct(
                    F.transform(idxs, lambda i: F.substring(F.col("t"), i, run_len))
                )
            ).alias("sub"),
        )
    )
    if winnow_k > 1:
        out = out.filter(F.pmod(F.xxhash64("sub"), F.lit(winnow_k)) == 0)
    return out


def suffix_run_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    run_len: int = 32,
    winnow_k: int = 1,
    max_bucket_size: int = 10_000,
) -> DataFrame:
    """Distinct (a_id, b_id) sharing an exact >= run_len substring."""
    subs = substring_windows(df, id_col, text_col, run_len, winnow_k)
    sizes = subs.groupBy("sub").agg(F.count("*").alias("n"))
    subs = subs.join(
        sizes.filter((F.col("n") > 1) & (F.col("n") <= max_bucket_size)).select("sub"),
        on="sub",
    )
    a = subs.alias("a")
    b = subs.alias("b")
    return (
        a.join(b, on="sub")
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"))
        .distinct()
        .withColumn("source", F.lit("suffix"))
    )


# --- winnowing document fingerprints (rolling-hash scheme) ----------------

_WIN_B = 257          # polynomial base
_WIN_M = 2147483647   # 2^31 - 1


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 6,
    w: int = 4,
) -> DataFrame:
    """MOSS-style winnowing fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03): polynomial k-gram hashes over the text, then the minimum
    hash of every window of ``w`` consecutive grams, deduplicated per doc.

    Guarantee: any substring shared between two docs of length
    >= w + k - 1 contributes at least one common fingerprint, while only
    ~2/(w+1) of positions are kept — the classic boilerplate /
    plagiarism-detection fingerprint set at bounded density.

    Everything is whole-stage-codegen JVM: the hash is a fixed-k sum of
    ``ascii * B^j`` terms (no Python), the window minimum is a frame-bound
    window aggregate — and both are expressible verbatim in DuckDB, so the
    driver entry is value-checked cross-engine.  k=6 keeps the unreduced
    polynomial sum < 2^63 (no overflow under ANSI mode in either engine).
    """
    t = F.col("t")
    positions = F.sequence(
        F.lit(1), F.greatest(F.length(t) - F.lit(k - 1), F.lit(0))
    )
    grams = (
        df.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("t"))
        .filter(F.length(t) >= k)
        .select("doc_id", "t", F.explode(positions).alias("pos"))
    )
    h = F.lit(0).cast("long")
    for j in range(k):
        h = h + F.ascii(F.substring(t, F.col("pos") + F.lit(j), 1)).cast(
            "long"
        ) * F.lit(_WIN_B ** (k - 1 - j))
    hashed = grams.select("doc_id", "pos", F.pmod(h, F.lit(_WIN_M)).alias("h"))

    from pyspark.sql import Window

    frame = (
        Window.partitionBy("doc_id")
        .orderBy("pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    # a window starting at pos only exists when w grams remain
    n_grams = F.count("*").over(Window.partitionBy("doc_id"))
    return (
        hashed.withColumn("fp", F.min("h").over(frame))
        .withColumn("_n", n_grams)
        .filter(F.col("pos") <= F.col("_n") - F.lit(w - 1))
        .select("doc_id", "fp")
        .distinct()
    )


def repeated_substring_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_len: int = 32,
    sample_mod: int = 1,
) -> DataFrame:
    """Substring-level exact-dup statistics — the per-document view of
    Lee et al., "Deduplicating Training Data Makes Language Models
    Better" (arXiv:2107.06499): how much of each document is covered by
    length-``window_len`` character windows that occur MORE THAN ONCE
    corpus-wide.  (The paper removes such spans with a suffix array;
    here the windows are hashed relationally and coverage is reported
    per doc so a curation pass can cut or drop by threshold.)

    ``sample_mod=1`` hashes every position — exact.  ``sample_mod=k>1``
    keeps a window iff its CONTENT hash ≡ 0 (mod k): content-defined
    sampling is ALIGNMENT-FREE (every occurrence of the same substring
    is kept or dropped identically, wherever it sits in its document —
    positional striding would miss ~(k-1)/k of cross-doc duplicates
    whose occurrences are not congruent mod k), at the cost of a
    probabilistic guarantee: a shared run with m = R - L + 1 window
    positions is missed with probability ~(1-1/k)^m, and the reported
    coverage is a LOWER BOUND built from the sampled windows (exact at
    k=1).  Same modular-sampling scheme as this module's winnowed
    substring join above.

    Scale shape: windows are hashed to 60-bit md5 keys WHERE THE TEXT
    LIVES and sampling drops (k-1)/k of rows in-task — only surviving
    (key, id, pos) rows ride the one corpus-wide exchange (the window
    body never shuffles).  Duplicate marking is a count-over-key
    window; per-doc span coverage is a lead()-window interval union
    (sum of min(L, next_pos - pos)) plus one exchange back on the doc
    id.  All exact integers — engine-portable by construction.

    Returns one row per input doc: (doc_id, n_chars, n_windows,
    n_dup_windows, dup_span_chars, dup_span_frac); n_windows counts all
    stride-1 positions (the denominator semantics don't depend on k).

    Cost note: the relational form pays one md5 per character position
    before sampling.  Measured (BENCH.md) this is the FASTEST tested
    hashing stage — JVM md5 in codegen beats and then ties the
    vectorized Karp-Rabin mapInPandas variant
    (``repeated_substring_stats_rolling``) up through 30 KB documents;
    the variant remains for multi-MB docs and non-md5 key families, and
    a true distributed suffix array is the full Lee-et-al. span-removal
    path.  The downstream dup-marking + coverage plan is shared either
    way (``_coverage_from_keyed``).
    """
    from pyspark.sql import Window

    from fuzzymatch_spark.operators.textstats import md5_fingerprint64

    L, K = int(window_len), int(sample_mod)
    if L < 2 or K < 1:
        raise ValueError(
            "repeated_substring_stats: need window_len >= 2, "
            "sample_mod >= 1"
        )
    n_chars = F.length(F.col(text_col))
    n_pos = F.when(n_chars >= L, n_chars - L + 1).otherwise(F.lit(0))

    keyed = (
        df.select(
            F.col(id_col).alias("_rs_id"),
            F.col(text_col).alias("_t"),
            F.explode(
                F.when(
                    n_pos > 0, F.sequence(F.lit(1), n_pos)
                ).otherwise(F.array().cast("array<int>"))
            ).alias("pos"),
        )
        .select(
            "_rs_id",
            "pos",
            md5_fingerprint64(
                F.expr(f"substring(_t, pos, {L})")
            ).alias("wkey"),
        )
    )
    if K > 1:
        keyed = keyed.filter(F.pmod(F.col("wkey"), F.lit(K)) == 0)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_pos.cast("long").alias("n_windows"),
    )
    return _coverage_from_keyed(keyed, base, L)


def _coverage_from_keyed(keyed: DataFrame, base: DataFrame, L: int) -> DataFrame:
    """Shared downstream plan for substring-coverage variants: dup
    marking (count over the window key) + per-doc lead()-window interval
    union + full-grain left join — identical whichever hashing stage
    produced the (_rs_id, pos, wkey) rows."""
    from pyspark.sql import Window

    dup_pos = (
        keyed.withColumn(
            "n_occ", F.count("*").over(Window.partitionBy("wkey"))
        )
        .filter(F.col("n_occ") > 1)
        .select("_rs_id", "pos")
    )
    w_doc = Window.partitionBy("_rs_id").orderBy("pos")
    nxt = F.lead("pos").over(w_doc)
    contrib = F.when(nxt.isNull(), F.lit(L)).otherwise(
        F.least(F.lit(L), nxt - F.col("pos"))
    )
    cover = (
        dup_pos.withColumn("contrib", contrib)
        .groupBy("_rs_id")
        .agg(
            F.count("*").cast("long").alias("n_dup_windows"),
            F.sum("contrib").cast("long").alias("dup_span_chars"),
        )
    )
    return (
        base.join(
            cover.withColumnRenamed("_rs_id", "doc_id"), "doc_id", "left"
        )
        .select(
            "doc_id",
            "n_chars",
            "n_windows",
            F.coalesce("n_dup_windows", F.lit(0)).alias("n_dup_windows"),
            F.coalesce("dup_span_chars", F.lit(0)).alias("dup_span_chars"),
            F.round(
                F.coalesce("dup_span_chars", F.lit(0))
                / F.greatest(F.col("n_chars"), F.lit(1)),
                6,
            ).alias("dup_span_frac"),
        )
    )


def repeated_substring_stats_rolling(
    df: DataFrame,
    id_col: str,
    text_col: str,
    window_len: int = 32,
    sample_mod: int = 1,
) -> DataFrame:
    """Alternative hashing stage for ``repeated_substring_stats``:
    double Karp-Rabin polynomial hashes computed VECTORIZED inside
    ``mapInPandas`` — Horner's rule as 2 x ``window_len`` whole-batch
    numpy multiply-accumulate passes (int64, mod 31-bit primes each
    step so products never overflow).  Sampling (combined key % k == 0)
    drops rows before they leave the task, so only surviving
    (id, pos, key) rows reach the exchange.

    Measured A/B vs the relational md5 stage (local[32], k=4, L=32):
    caption-scale docs (sf0.1, ~500 B) relational 0.57 s vs rolling
    3.07 s (Arrow round-trip dominates); 30 KB docs (9.6M windows)
    0.66 s vs 0.65 s — a tie.  JVM md5 in codegen is simply
    competitive: keep the RELATIONAL operator as the default at every
    tested scale; this variant exists for multi-MB documents (book/code
    files), where per-window md5 cost grows with document count x
    length while the numpy passes stay memory-bandwidth-bound, and as
    the non-md5 key path when a deployment needs a keyed-hash family.

    Keys are 62-bit double-modulus polynomial values, not md5 — so this
    variant is rows-only (no DuckDB oracle; the engine's oracle-portable
    hash rule reserves md5 for checked paths).  Its OUTPUT STATISTICS at
    any k are pinned by test to the relational operator's on planted
    data at k=1 (both detect exactly the equal-window pairs; the
    polynomial double-hash collision rate ~2^-62 is negligible), and the
    downstream plan is literally shared (``_coverage_from_keyed``).

    Caveats vs the relational variant: windows/positions are UTF-8
    BYTES here (numpy operates on the encoded buffer) vs CHARACTERS
    there — identical on ASCII corpora, shifted on multibyte text; and
    the id column must be integral (the Arrow schema pins ``long``).
    """
    import pandas as pd

    L, K = int(window_len), int(sample_mod)
    if L < 2 or K < 1:
        raise ValueError(
            "repeated_substring_stats_rolling: need window_len >= 2, "
            "sample_mod >= 1"
        )
    M1, M2 = 2147483647, 2147483629  # two Mersenne-ish 31-bit primes
    B1, B2 = 257, 263

    def go(batches):
        import numpy as np

        for pdf in batches:
            ids, poss, keys = [], [], []
            for rid, txt in zip(pdf["_rs_id"], pdf["_t"]):
                data = np.frombuffer(
                    (txt or "").encode("utf-8", "surrogatepass"), np.uint8
                ).astype(np.int64)
                n = data.shape[0] - L + 1
                if n <= 0:
                    continue
                h1 = np.zeros(n, np.int64)
                h2 = np.zeros(n, np.int64)
                for j in range(L):  # Horner, vectorized across positions
                    c = data[j:j + n]
                    h1 = (h1 * B1 + c) % M1
                    h2 = (h2 * B2 + c) % M2
                key = h1 * M2 + h2  # < 2^62, collision-free per (h1,h2)
                if K > 1:
                    keep = (key % K) == 0
                    pos = np.nonzero(keep)[0] + 1
                    key = key[keep]
                else:
                    pos = np.arange(1, n + 1)
                ids.extend([rid] * pos.shape[0])
                poss.append(pos)
                keys.append(key)
            if ids:
                yield pd.DataFrame({
                    "_rs_id": np.asarray(ids),
                    "pos": np.concatenate(poss).astype(np.int32),
                    "wkey": np.concatenate(keys),
                })
            else:
                yield pd.DataFrame({
                    "_rs_id": pd.Series([], dtype="int64"),
                    "pos": pd.Series([], dtype="int32"),
                    "wkey": pd.Series([], dtype="int64"),
                })

    n_chars = F.length(F.col(text_col))
    n_pos = F.when(n_chars >= L, n_chars - L + 1).otherwise(F.lit(0))
    keyed = df.select(
        F.col(id_col).alias("_rs_id"), F.col(text_col).alias("_t")
    ).mapInPandas(go, "_rs_id long, pos int, wkey long")
    base = df.select(
        F.col(id_col).alias("doc_id"),
        n_chars.cast("long").alias("n_chars"),
        n_pos.cast("long").alias("n_windows"),
    )
    return _coverage_from_keyed(keyed, base, L)
