"""Corpus-curation operators: repetition stats, decontamination,
stratified sampling, TF-IDF ranking.

Each gets (a) hand-computed golden values on tiny planted docs and
(b) a shape/invariant check on the real test corpus.  The DuckDB
cross-engine check runs via the driver's oracle harness; these tests pin
semantics independently of that harness.
"""

import math

import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.operators.corpus import (
    decontaminate_ngrams,
    repetition_stats,
    stratified_sample,
    tfidf_topk,
)


def _mkdocs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- repetition

def test_repetition_stats_golden(spark):
    # doc 1: "a a a b" -> top unigram a: 3/4
    #   2-grams: [a a, a a, a b] -> top 2/3, distinct 2 -> excess 1/3
    #   3-grams: [a a a, a a b] -> both singletons -> dup 0
    # doc 2: "x y x y x y" -> top unigram 3/6
    #   2-grams: [x y, y x, x y, y x, x y] -> top 3/5, excess 3/5
    #   3-grams: [x y x, y x y, x y x, y x y] -> all dup -> 1.0
    df = _mkdocs(spark, [(1, "a a a b"), (2, "x y x y x y")])
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df, "doc_id", "text").collect()}

    r1 = got[1]
    assert r1["n_tokens"] == 4
    assert r1["top_unigram_frac"] == 0.75
    assert r1["top_2gram_frac"] == round(2 / 3, 6)
    assert r1["excess_2gram_frac"] == round(1 / 3, 6)
    assert r1["dup_3gram_frac"] == 0.0

    r2 = got[2]
    assert r2["top_unigram_frac"] == 0.5
    assert r2["top_2gram_frac"] == 0.6
    assert r2["excess_2gram_frac"] == 0.6
    assert r2["dup_3gram_frac"] == 1.0
    assert r2["repetition_pass"] == 0  # heavy repetition fails the gate


def test_repetition_stats_short_docs(spark):
    # docs shorter than the gram width must not error and report 0 fracs
    df = _mkdocs(spark, [(1, "solo"), (2, "two words")])
    got = {r["doc_id"]: r.asDict() for r in repetition_stats(df, "doc_id", "text").collect()}
    assert got[1]["n_tokens"] == 1
    assert got[1]["top_2gram_frac"] == 0.0
    assert got[1]["dup_3gram_frac"] == 0.0
    assert got[2]["top_2gram_frac"] == 1.0  # one 2-gram, occurs once -> 1/1
    assert got[2]["dup_3gram_frac"] == 0.0


def test_repetition_stats_corpus_invariants(documents):
    out = repetition_stats(documents, "doc_id", "text")
    rows = out.collect()
    assert len(rows) == documents.count()
    for r in rows:
        for c in ("top_unigram_frac", "top_2gram_frac",
                  "excess_2gram_frac", "dup_3gram_frac"):
            assert 0.0 <= r[c] <= 1.0, (r["doc_id"], c, r[c])
        # top-gram frequency can never be below the excess fraction's
        # implied minimum: if excess > 0 some gram repeats -> top >= 2/n
        if r["excess_2gram_frac"] > 0:
            assert r["top_2gram_frac"] > 0


# ------------------------------------------------------------ decontaminate

def test_decontaminate_golden(spark):
    docs = _mkdocs(spark, [
        (1, "the quick brown fox jumps"),      # shares "quick brown fox"
        (2, "lorem ipsum dolor sit amet"),     # clean
        (3, "quick brown fox quick brown fox"),  # distinct grams, 2 hits
    ])
    bench = _mkdocs(spark, [(100, "a quick brown fox runs")])
    got = {r["doc_id"]: r.asDict()
           for r in decontaminate_ngrams(docs, bench, "doc_id", "text", n=3).collect()}
    assert got[1]["contaminated"] == 1
    assert got[1]["n_gram_hits"] == 1          # only "quick brown fox"
    assert got[2] == {"doc_id": 2, "n_gram_hits": 0, "contaminated": 0}
    # doc 3 distinct 3-grams: [quick brown fox, brown fox quick,
    #   fox quick brown] -> only the first is in the benchmark
    assert got[3]["n_gram_hits"] == 1


def test_decontaminate_covers_all_docs(documents):
    bench = documents.filter(F.col("source") == "src0")
    out = decontaminate_ngrams(documents, bench, "doc_id", "text", n=3)
    assert out.count() == documents.count()
    # every src0 doc with >= 3 tokens shares its own grams with the bench
    self_rows = (
        out.join(documents.select("doc_id", "source", "text"), "doc_id")
        .filter((F.col("source") == "src0") & (F.size(F.split("text", " ")) >= 3))
    )
    assert self_rows.filter(F.col("contaminated") == 0).count() == 0


# ---------------------------------------------------------------- sampling

def test_stratified_sample_deterministic(documents):
    out1 = stratified_sample(documents, ["lang", "source"], "doc_id", 3)
    out2 = stratified_sample(documents, ["lang", "source"], "doc_id", 3)
    rows1 = sorted(tuple(r) for r in out1.collect())
    rows2 = sorted(tuple(r) for r in out2.collect())
    assert rows1 == rows2
    # never more than k per stratum
    per = out1.groupBy("lang", "source").count().collect()
    assert all(r["count"] <= 3 for r in per)
    assert max(r["count"] for r in per) == 3  # strata are big enough here


def test_stratified_sample_matches_portable_hash(spark):
    import hashlib
    df = _mkdocs(spark, [(i, "t") for i in range(50)]).withColumn(
        "grp", F.lit("g")
    )
    got = [r["doc_id"] for r in
           stratified_sample(df, ["grp"], "doc_id", 5)
           .orderBy("sample_rank").collect()]
    want = sorted(range(50),
                  key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))[:5]
    assert got == want


# ------------------------------------------------------------------ tf-idf

def test_tfidf_golden(spark):
    docs = _mkdocs(spark, [
        (1, "spark spark shuffle"),
        (2, "spark join"),
        (3, "window sort merge"),
    ])
    out = {r["doc_id"]: r["tfidf"]
           for r in tfidf_topk(docs, "spark shuffle", "doc_id", "text", k=10).collect()}
    idf_spark = math.log(4 / 3) + 1.0
    idf_shuffle = math.log(4 / 2) + 1.0
    assert out[1] == round(2 * idf_spark + 1 * idf_shuffle, 6)
    assert out[2] == round(1 * idf_spark, 6)
    assert 3 not in out  # no query term present
    # rarer term outweighs a repeat of a common one at equal tf
    assert out[1] > out[2]


def test_tfidf_topk_order_and_k(documents):
    out = tfidf_topk(documents, "spark shuffle window", "doc_id", "text", k=7)
    rows = out.collect()
    assert len(rows) == 7
    scores = [r["tfidf"] for r in rows]
    assert scores == sorted(scores, reverse=True)


# ---------------------------------------------------------------- pair eval

def test_pair_eval_golden(spark):
    from fuzzymatch_spark.operators.corpus import pair_eval

    pred = spark.createDataFrame(
        [(1, 2), (3, 4), (6, 5), (7, 8)], "a_id long, b_id long"
    )
    truth = spark.createDataFrame(
        # (5,6) matches (6,5) after canonicalization; (2,1) dups (1,2)
        [(1, 2), (2, 1), (5, 6), (9, 10)], "a_id long, b_id long"
    )
    row = pair_eval(pred, truth).collect()[0].asDict()
    assert row == {
        "n_pred": 4, "n_truth": 3, "n_hit": 2,
        "prec": 0.5, "recall": round(2 / 3, 6), "f1": round(4 / 7, 6),
    }


def test_pair_eval_empty_pred(spark):
    from fuzzymatch_spark.operators.corpus import pair_eval

    pred = spark.createDataFrame([], "a_id long, b_id long")
    truth = spark.createDataFrame([(1, 2)], "a_id long, b_id long")
    row = pair_eval(pred, truth).collect()[0].asDict()
    assert row["n_pred"] == 0 and row["prec"] == 0.0 and row["f1"] == 0.0


# ------------------------------------------------------------------ k-means

def test_kmeans_lloyd_converges_on_planted_blobs(spark):
    import numpy as np
    from fuzzymatch_spark.operators.ann import kmeans_lloyd

    # three tight blobs in 8-d; first 3 rows (the init centroids) are one
    # member of each blob, so k=3 must recover the blobs exactly
    rng = np.random.RandomState(7)
    centers = rng.normal(size=(3, 8)) * 5
    rows = []
    vid = 0
    for rep in range(10):
        for b in range(3):
            v = centers[b] + rng.normal(size=8) * 0.05
            rows.append((vid, [float(x) for x in v], b))
            vid += 1
    df = spark.createDataFrame(
        [(i, v) for i, v, _ in rows], "vec_id long, embedding array<float>"
    )
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_lloyd(df, "embedding", k=3, iters=2).collect()}
    # rows were laid out blob-cyclically: vec_id % 3 is the true blob, and
    # init centroid i belongs to blob i
    for i, _, blob in rows:
        assert got[i] == blob, (i, got[i], blob)


def test_kmeans_lloyd_deterministic(embeddings):
    from fuzzymatch_spark.operators.ann import kmeans_lloyd

    a = sorted(tuple(r) for r in
               kmeans_lloyd(embeddings, "embedding", k=4, iters=2).collect())
    b = sorted(tuple(r) for r in
               kmeans_lloyd(embeddings, "embedding", k=4, iters=2).collect())
    assert a == b
    assert len(a) == 1000 or len(a) > 0


# ----------------------------------------------------------------- chunking

def test_chunk_documents_golden(spark):
    from fuzzymatch_spark.operators.corpus import chunk_documents

    df = _mkdocs(spark, [
        (1, "a b c d e"),      # n=5, chunk 3, overlap 1 -> starts 0, 2
        (2, "a b c d e f"),    # n=6 -> starts 0, 2, 4 (short tail chunk)
        (3, "a b"),            # n <= chunk -> single chunk
    ])
    rows = sorted(
        tuple(r) for r in
        chunk_documents(df, "doc_id", "text", chunk_tokens=3, overlap=1)
        .collect()
    )
    assert rows == [
        (1, 0, 0, 3, "a b c"),
        (1, 1, 2, 3, "c d e"),
        (2, 0, 0, 3, "a b c"),
        (2, 1, 2, 3, "c d e"),
        (2, 2, 4, 2, "e f"),
        (3, 0, 0, 2, "a b"),
    ]


def test_chunk_documents_covers_every_token(documents):
    from fuzzymatch_spark.operators.corpus import chunk_documents

    out = chunk_documents(documents, "doc_id", "text",
                          chunk_tokens=32, overlap=8)
    # every token index of every doc falls inside some chunk: the last
    # chunk's start + its length reaches the doc's token count
    cover = (
        out.groupBy("doc_id")
        .agg(F.max(F.col("start_token") + F.col("n_chunk_tokens")).alias("reach"))
        .join(
            documents.select(
                "doc_id", F.size(F.split("text", " ")).alias("n")
            ),
            "doc_id",
        )
    )
    assert cover.filter(F.col("reach") != F.col("n")).count() == 0
    # overlap invariant: consecutive chunks share exactly `overlap` tokens
    # except possibly the short tail
    full = out.filter(F.col("n_chunk_tokens") == 32)
    assert full.filter((F.col("start_token") % 24) != 0).count() == 0


def test_chunk_documents_rejects_bad_overlap(spark):
    from fuzzymatch_spark.operators.corpus import chunk_documents

    df = _mkdocs(spark, [(1, "a b")])
    with pytest.raises(ValueError):
        chunk_documents(df, "doc_id", "text", chunk_tokens=4, overlap=4)


# ------------------------------------------------------- cluster agreement

def test_cluster_agreement_identical_and_golden(spark):
    from fuzzymatch_spark.operators.cluster import cluster_agreement

    a = spark.createDataFrame(
        [(1, 0), (2, 0), (3, 1), (4, 1)], "id long, cluster int"
    )
    # identical clusterings: both indices are exactly 1
    row = cluster_agreement(a, a).collect()[0].asDict()
    assert row["rand_index"] == 1.0 and row["adjusted_rand"] == 1.0
    assert row["n_items"] == 4 and row["agree_both"] == 2

    # b merges everything into one cluster: S = C(4,2)=6 intersections?
    # contingency: cells (0,0):2, (1,0):2 -> S = 1+1 = 2; Sa = 2; Sb = 6
    # T = 6; Rand = (6 + 4 - 2 - 6)/6 = 1/3
    # ARI = (2 - 2*6/6) / ((2+6)/2 - 2) = 0 / 2 = 0
    b = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9), (4, 9)], "id long, cluster int"
    )
    row = cluster_agreement(a, b).collect()[0].asDict()
    assert row["rand_index"] == round(1 / 3, 6)
    assert row["adjusted_rand"] == 0.0


def test_cluster_agreement_label_permutation_invariant(spark):
    from fuzzymatch_spark.operators.cluster import cluster_agreement

    a = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id long, cluster int"
    )
    relabeled = spark.createDataFrame(
        [(i, (i % 3 + 7) * 11) for i in range(30)], "id long, cluster int"
    )
    row = cluster_agreement(a, relabeled).collect()[0].asDict()
    assert row["rand_index"] == 1.0 and row["adjusted_rand"] == 1.0


# --------------------------------------------------------------- hashing vec

def test_hash_vectorize_golden(spark):
    from fuzzymatch_spark.operators.corpus import hash_vectorize, _HASH_MOD

    def bucket(tok, dim=8):
        acc = 0
        for ch in tok:
            acc = (acc * 31 + ord(ch)) % _HASH_MOD
        return acc % dim

    df = _mkdocs(spark, [(1, "spark spark join"), (2, "a  b")])  # double space
    got = {r["vec_id"]: r["embedding"]
           for r in hash_vectorize(df, "doc_id", "text", dim=8).collect()}
    want1 = [0.0] * 8
    want1[bucket("spark")] += 2
    want1[bucket("join")] += 1
    assert got[1] == want1
    # empty token from the doubled space is dropped, not hashed
    want2 = [0.0] * 8
    want2[bucket("a")] += 1
    want2[bucket("b")] += 1
    assert got[2] == want2


def test_hash_vectorize_feeds_kmeans(documents):
    from fuzzymatch_spark.operators.ann import kmeans_lloyd
    from fuzzymatch_spark.operators.corpus import hash_vectorize

    vecs = hash_vectorize(documents, "doc_id", "text", dim=64)
    out = kmeans_lloyd(vecs, "embedding", k=4, iters=2).collect()
    assert len(out) == documents.count()
    assert set(r["cluster"] for r in out) <= {0, 1, 2, 3}
    assert all(0.0 <= r["cos"] <= 1.0 for r in out)  # count vectors: cos >= 0


# ------------------------------------------------------ vocab / unigram LM

def test_vocab_top_tokens_golden(spark):
    from fuzzymatch_spark.operators.corpus import vocab_top_tokens

    df = spark.createDataFrame(
        [(1, "a", "x x y z"), (2, "a", "x y"), (3, "b", "q")],
        "doc_id long, source string, text string",
    )
    got = [(r["source"], r["token"], r["n"], r["rank"]) for r in
           vocab_top_tokens(df, "text", ["source"], k=2)
           .orderBy("source", "rank").collect()]
    assert got == [("a", "x", 3, 1), ("a", "y", 2, 2), ("b", "q", 1, 1)]


def test_unigram_logprob_ranks_rare_docs_higher(spark):
    import math

    from fuzzymatch_spark.operators.corpus import unigram_logprob

    df = spark.createDataFrame(
        [(1, "common common common"), (2, "common common rare")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in
           unigram_logprob(df, "doc_id", "text").collect()}
    # corpus: common tf=5, rare tf=1, n_total=6, n_vocab=2
    p_common = 6 / 8
    p_rare = 2 / 8
    assert got[1]["mean_neg_logprob"] == round(-math.log(p_common), 6)
    assert got[2]["mean_neg_logprob"] == round(
        -(2 * math.log(p_common) + math.log(p_rare)) / 3, 6
    )
    # the doc containing a rare token scores strictly higher
    assert got[2]["mean_neg_logprob"] > got[1]["mean_neg_logprob"]


def test_kmeans_survives_zero_vectors(spark):
    # regression: an all-zero vector (hash_vectorize of an empty doc)
    # used to divide by zero under ANSI mode; it must land in the lowest
    # label with cos 0 instead
    from fuzzymatch_spark.operators.ann import kmeans_lloyd

    df = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [0.0, 1.0]), (2, [0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r for r in
           kmeans_lloyd(df, "embedding", k=2, iters=2).collect()}
    assert got[2]["cluster"] == 0 and got[2]["cos"] == 0.0


def test_curate_rejects_half_specified_cap(spark, documents):
    import pytest as _pytest

    from jobs.curate_job import curate

    docs = documents.select("doc_id", "lang", "source", "text")
    bench = docs.filter(F.col("source") == "src0")
    with _pytest.raises(ValueError):
        curate(docs, "doc_id", "text", bench, per_stratum_cap=5)
    with _pytest.raises(ValueError):
        curate(docs, "doc_id", "text", bench, strata_cols=["lang"])


def test_curate_drops_short_benchmark_docs_by_id(spark):
    # a benchmark doc with fewer tokens than ngram_n has no grams and
    # passes the self-contamination gate; benchmark-source mode must
    # drop it by id
    from jobs.curate_job import curate

    docs = spark.createDataFrame(
        [
            # 6 distinct tokens: passes the repetition gate (top
            # unigram 1/6, top 2-gram 1/5 = 0.20 at the boundary) but
            # has no 7-grams, so self-contamination can't catch it
            (1, "en", "bench", "small eval question answer pair one"),
            (2, "en", "train",
             "a perfectly normal training document with many words here"),
        ],
        "doc_id long, lang string, source string, text string",
    )
    bench = docs.filter(F.col("source") == "bench")
    kept_without = {r["doc_id"] for r in
                    curate(docs, "doc_id", "text", bench, ngram_n=7).collect()}
    assert 1 in kept_without  # the documented leak without the id drop
    kept_with = {r["doc_id"] for r in
                 curate(docs, "doc_id", "text", bench, ngram_n=7,
                        drop_benchmark_ids=True).collect()}
    assert 1 not in kept_with and 2 in kept_with


def test_cluster_agreement_degenerate_conventions(spark):
    from fuzzymatch_spark.operators.cluster import cluster_agreement

    # both clusterings all-singletons: s = sa = sb = 0, so the ARI
    # denominator is 0 — pinned to 1.0 (standard convention), never
    # NULL/NaN or an ANSI divide abort
    a = spark.createDataFrame(
        [(1, 1), (2, 2), (3, 3)], "id long, cluster int"
    )
    row = cluster_agreement(a, a).collect()[0].asDict()
    assert row["rand_index"] == 1.0 and row["adjusted_rand"] == 1.0

    # both all-one-cluster: denominator also 0 -> 1.0
    b = spark.createDataFrame(
        [(1, 9), (2, 9), (3, 9)], "id long, cluster int"
    )
    row = cluster_agreement(b, b).collect()[0].asDict()
    assert row["rand_index"] == 1.0 and row["adjusted_rand"] == 1.0

    # a single item: T = C(1,2) = 0 -> both indices pinned to 1.0
    one = spark.createDataFrame([(1, 0)], "id long, cluster int")
    row = cluster_agreement(one, one).collect()[0].asDict()
    assert row["rand_index"] == 1.0 and row["adjusted_rand"] == 1.0


def test_kmeans_zero_centroid_guard(spark):
    from fuzzymatch_spark.operators.ann import kmeans_lloyd

    # first-k init includes an all-zero vector (an empty document through
    # hash_vectorize): the zero CENTROID must not divide by zero, in the
    # init round or after an update that reproduces the zero cell
    rows = [
        (0, [0.0, 0.0, 0.0, 0.0]),
        (1, [1.0, 0.0, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (3, [1.0, 1.0, 0.0, 0.0]),
        (4, [0.0, 0.0, 1.0, 1.0]),
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = {r["vec_id"]: r["cluster"]
           for r in kmeans_lloyd(df, "embedding", k=3, iters=2).collect()}
    assert set(out) == {0, 1, 2, 3, 4}
    # the zero vector scores cos 0 against every centroid and takes the
    # lowest label through the tie-break
    assert out[0] == 0


def test_decontaminate_bloom_matches_exact(documents):
    """The Bloom-bounded variant must be EXACT: bit-identical rows to the
    plain broadcast-join operator (false positives removed by the
    residual join), while the bloom probe prunes ~all clean grams."""
    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.corpus import (
        decontaminate_ngrams,
        decontaminate_ngrams_bloom,
    )

    docs = documents.select("doc_id", "source", "text")
    bench = docs.filter(F.col("source") == "src0").drop("source")
    plain = sorted(
        tuple(r)
        for r in decontaminate_ngrams(docs, bench, "doc_id", "text", n=4)
        .collect()
    )
    bloom = sorted(
        tuple(r)
        for r in decontaminate_ngrams_bloom(
            docs, bench, "doc_id", "text", n=4, expected_grams=100_000
        ).collect()
    )
    assert bloom == plain
    assert any(r[2] == 1 for r in bloom)  # benchmark self-hits flagged


def test_split_by_hash_deterministic_and_stable(documents):
    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.corpus import split_by_hash

    docs = documents.select("doc_id")
    a = {r["doc_id"]: r["split"] for r in split_by_hash(docs, "doc_id").collect()}
    b = {r["doc_id"]: r["split"] for r in split_by_hash(docs, "doc_id").collect()}
    assert a == b                                    # deterministic
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9                    # ~weights respected
    assert set(a.values()) == {"train", "val", "test"}
    # growth stability: membership doesn't change when the corpus shrinks
    half = {r["doc_id"]: r["split"]
            for r in split_by_hash(
                docs.filter(F.col("doc_id") % 2 == 0), "doc_id"
            ).collect()}
    assert all(a[k] == v for k, v in half.items())


def test_split_by_hash_validates_weights(documents):
    import pytest

    from fuzzymatch_spark.operators.corpus import split_by_hash

    docs = documents.select("doc_id")
    with pytest.raises(ValueError):
        split_by_hash(docs, "doc_id", (("a", 0.5), ("b", 0.4)))
    with pytest.raises(ValueError):
        split_by_hash(docs, "doc_id", (("a", 1.5), ("b", -0.5)))


def test_pack_chunks_bins_are_contiguous_budgeted(spark):
    import pytest
    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.corpus import pack_chunks

    rows = [("s1", i, 0, 30) for i in range(20)] + \
           [("s2", i, 0, 50) for i in range(7)]
    df = spark.createDataFrame(
        rows, "source string, doc_id long, chunk_id int, n_chunk_tokens long"
    )
    out = pack_chunks(df, ["source"], budget=100)
    got = [(r["source"], r["doc_id"], r["bin_id"])
           for r in out.orderBy("source", "bin_id", "doc_id").collect()]
    # per-source: bin = floor(preceding cumsum / 100); s1 chunks are 30
    # tokens -> bins hold starts at 0,30,60,90 | 120.. etc.
    for src, size, count in (("s1", 30, 20), ("s2", 50, 7)):
        bins = [b for s, _, b in got if s == src]
        assert bins == sorted(bins)
        # reconstruct expected from the definition
        exp, cum = [], 0
        for _ in range(count):
            exp.append(cum // 100)
            cum += size
        assert sorted(bins) == sorted(exp)
    with pytest.raises(ValueError):
        pack_chunks(df, [], budget=100)
    with pytest.raises(ValueError):
        pack_chunks(df, ["source"], budget=0)


# ------------------------------------------------------------- line dedup


def test_line_dedup_stats_golden(spark):
    from fuzzymatch_spark.operators.corpus import line_dedup_stats

    # doc 1: two unique lines + the shared boilerplate line
    # doc 2: the boilerplate line twice (second is an in-doc repeat)
    # doc 3: exactly doc 1 (every line a dup; keeps nothing)
    docs = _mkdocs(
        spark,
        [
            (1, "alpha one\nboilerplate footer\nbeta two"),
            (2, "boilerplate footer\nboilerplate footer"),
            (3, "alpha one\nboilerplate footer\nbeta two"),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in line_dedup_stats(docs, "doc_id", "text").collect()
    }
    assert out[1]["n_lines"] == 3
    assert out[1]["n_dup_lines"] == 3  # all three lines recur corpus-wide
    assert out[1]["kept_lines"] == 3  # doc 1 holds every first occurrence
    assert out[2] == {
        "doc_id": 2,
        "n_lines": 2,
        "n_dup_lines": 2,
        "kept_lines": 0,
        "dup_line_frac": 1.0,
        "kept_fp": out[2]["kept_fp"],
    }
    assert out[3]["kept_lines"] == 0
    # empty survivors hash the empty string on both engines
    import hashlib

    assert out[3]["kept_fp"] == hashlib.md5(b"").hexdigest()
    # doc 1's surviving text is its full original text
    assert (
        out[1]["kept_fp"]
        == hashlib.md5(
            b"alpha one\nboilerplate footer\nbeta two"
        ).hexdigest()
    )


def test_line_dedup_trim_and_min_chars(spark):
    from fuzzymatch_spark.operators.corpus import line_dedup_stats

    docs = _mkdocs(spark, [(1, "  padded line  \n\n   \nreal line")])
    row = line_dedup_stats(docs, "doc_id", "text").collect()[0]
    # blank/whitespace-only lines are dropped; others trimmed before
    # keying so '  padded line  ' == 'padded line' corpus-wide
    assert row["n_lines"] == 2
    import hashlib

    assert (
        row["kept_fp"]
        == hashlib.md5(b"padded line\nreal line").hexdigest()
    )


# ---------------------------------------------------------------- DSIR

def _mkdocs_lang(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_select_prefers_target_like_docs(spark):
    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.corpus import dsir_select

    # target domain: docs about 'neural network training' (lang-tagged);
    # raw pool: 10 target, 20 target-LIKE candidates, 20 off-domain.
    # DSIR must rank the target-like candidates' log-weights above the
    # off-domain ones (the selection criterion, independent of Gumbel).
    rows = []
    for i in range(10):
        rows.append((i, "neural network training data scaling laws", "tgt"))
    for i in range(20):
        rows.append((100 + i, "training neural network models with data", "raw"))
    for i in range(20):
        rows.append((200 + i, "cheap furniture sale discount sofa table", "raw"))
    docs = _mkdocs_lang(spark, rows)
    out = dsir_select(
        docs, "doc_id", "text", target=F.col("lang") == "tgt",
        dim=128, k=50, seed=0,
    ).collect()
    logw = {r["doc_id"]: r["logw"] for r in out}
    like = [logw[d] for d in range(100, 120)]
    off = [logw[d] for d in range(200, 220)]
    assert min(like) > max(off)
    # is_target marks exactly the planted target rows
    assert all(r["is_target"] == (r["doc_id"] < 10) for r in out)


def test_dsir_select_deterministic_and_total(spark):
    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.corpus import dsir_select

    docs = _mkdocs_lang(
        spark,
        [(i, f"tok{i % 7} tok{i % 3} common", "en" if i % 2 else "xx")
         for i in range(40)]
        + [(99, "", "en")],  # empty doc: zero features -> logw == 0.0
    )
    sel = lambda: dsir_select(
        docs, "doc_id", "text", target=F.col("lang") == "en",
        dim=64, k=100, seed=7,
    ).collect()
    a, b = sel(), sel()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    # k > corpus size: every doc selected, ordered by key desc then id
    assert len(a) == 41
    keys = [(r["sample_key"], r["doc_id"]) for r in a]
    assert keys == sorted(keys, key=lambda t: (-t[0], t[1]))
    empty = [r for r in a if r["doc_id"] == 99][0]
    assert empty["logw"] == 0.0


def test_dsir_select_validates_params(spark):
    from pyspark.sql import functions as F

    import pytest as _pytest

    from fuzzymatch_spark.operators.corpus import dsir_select

    docs = _mkdocs_lang(spark, [(1, "a b", "en")])
    for kw in ({"dim": 0}, {"k": 0}, {"alpha": 0.0}):
        with _pytest.raises(ValueError):
            dsir_select(
                docs, "doc_id", "text",
                target=F.col("lang") == "en", **kw,
            )


# ---------------------------------------------------------------- BM25

def test_bm25_topk_golden_and_length_normalization(spark):
    from pytest import approx

    from fuzzymatch_spark.operators.corpus import bm25_topk

    # N=3, df(spark)=2, avgdl=2, idf = ln(1.5/2.5 + 1) = ln(1.6)
    # doc1 (tf=2, dl=3): s = idf * 4.4 / (2 + 1.2*(0.25 + 0.75*3/2))
    # doc2 (tf=1, dl=1): s = idf * 2.2 / (1 + 1.2*(0.25 + 0.75*1/2))
    docs = _mkdocs(spark, [
        (1, "spark spark dedup"),
        (2, "spark"),
        (3, "window join"),
    ])
    out = bm25_topk(docs, "spark", "doc_id", "text", k=10).collect()
    import math

    idf = math.log(1.6)
    assert [r["doc_id"] for r in out] == [2, 1]  # shorter doc wins: b>0
    assert out[0]["bm25"] == approx(idf * 2.2 / 1.75, abs=1e-5)
    assert out[1]["bm25"] == approx(idf * 4.4 / 3.65, abs=1e-5)


def test_bm25_tf_saturation(spark):
    from fuzzymatch_spark.operators.corpus import bm25_topk

    # same dl, tf 1 vs 10: score must grow sublinearly (< 3x for 10x tf)
    docs = _mkdocs(spark, [
        (1, " ".join(["spark"] * 1 + ["pad"] * 9)),
        (2, " ".join(["spark"] * 10)),
        (3, "other words entirely here now"),
    ])
    out = {r["doc_id"]: r["bm25"]
           for r in bm25_topk(docs, "spark", "doc_id", "text").collect()}
    assert out[2] > out[1]
    assert out[2] < 3 * out[1]


# ------------------------------------------------- fuzzy decontamination

def _toks3(start, n):
    # unique 3-letter tokens: each contributes EXACTLY one distinct
    # non-space trigram (itself), so shingle-set sizes are exact by
    # construction — `start` offsets make corpora fully disjoint
    import itertools

    combos = itertools.islice(
        itertools.product("abcdefghijklmnopqrst", repeat=3), start,
        start + n,
    )
    return ["".join(c) for c in combos]


def _long_text(start=0, n=80):
    return " ".join(_toks3(start, n))


def test_decontaminate_fuzzy_exact_copy_and_unrelated(spark):
    from fuzzymatch_spark.operators.corpus import decontaminate_fuzzy

    bench_text = _long_text(0)
    docs = _mkdocs(spark, [
        (1, bench_text),            # exact copy of a bench doc -> flagged
        (2, _long_text(2000)),      # disjoint tokens -> clean
        (100, bench_text),          # IS the bench doc (same id) -> excluded
    ])
    bench = _mkdocs(spark, [(100, bench_text)])
    out = {r["doc_id"]: r for r in
           decontaminate_fuzzy(docs, bench, "doc_id", "text").collect()}
    assert len(out) == 3  # one row per input doc
    assert out[1]["fuzzy_contaminated"] == 1 and out[1]["fuzzy_hits"] == 1
    assert out[2]["fuzzy_contaminated"] == 0 and out[2]["fuzzy_hits"] == 0
    assert out[100]["fuzzy_contaminated"] == 0  # self-pair never counts


def test_decontaminate_fuzzy_near_copy_and_threshold(spark):
    from fuzzymatch_spark.operators.corpus import decontaminate_fuzzy

    base = _long_text(0)  # exactly 80 distinct shingles
    docs = _mkdocs(spark, [
        (1, base + " zzz"),   # one extra shingle: J = 80/81 ~ 0.9877
        (2, _long_text(0, 40)),  # first half of the tokens: J = 0.5
    ])
    bench = _mkdocs(spark, [(100, base)])
    out = {r["doc_id"]: r["fuzzy_contaminated"] for r in
           decontaminate_fuzzy(
               docs, bench, "doc_id", "text", jaccard_pct=98
           ).collect()}
    assert out[1] == 1
    assert out[2] == 0
    # tighter threshold excludes the near-copy too
    out99 = {r["doc_id"]: r["fuzzy_contaminated"] for r in
             decontaminate_fuzzy(
                 docs, bench, "doc_id", "text", jaccard_pct=99
             ).collect()}
    assert out99[1] == 0


def test_decontaminate_fuzzy_hits_count_and_empty_guard(spark):
    from fuzzymatch_spark.operators.corpus import decontaminate_fuzzy

    t = _long_text(0)
    docs = _mkdocs(spark, [(1, t), (2, "ab")])
    bench = _mkdocs(spark, [(100, t), (101, t), (102, "xy")])
    out = {r["doc_id"]: r for r in
           decontaminate_fuzzy(docs, bench, "doc_id", "text").collect()}
    assert out[1]["fuzzy_hits"] == 2  # both bench copies counted
    # zero-shingle pair ("ab" vs "xy"): union == 0 never verifies
    assert out[2]["fuzzy_contaminated"] == 0


# ---------------------------------------------------------- bigram LM

def test_bigram_logprob_golden(spark):
    from pytest import approx

    from fuzzymatch_spark.operators.corpus import bigram_logprob

    # corpus: doc1 "a b a", doc2 "x" -> T=4, V=3; freq a:2 b:1 x:1
    # doc1 bigrams: (a,b): 0.8*(1/2) + 0.2*(2/7); (b,a): 0.8*1 + 0.2*(3/7)
    docs = _mkdocs(spark, [(1, "a b a"), (2, "x")])
    rows = {r["doc_id"]: r
            for r in bigram_logprob(docs, "doc_id", "text").collect()}
    assert 2 not in rows  # single-token doc: no bigram positions
    lam, oml = 0.8, 1.0 - 0.8
    t1 = -math.log(lam * 0.5 + oml * (2 / 7))
    t2 = -math.log(lam * 1.0 + oml * (3 / 7))
    assert rows[1]["n_bigrams"] == 2
    assert rows[1]["mean_neg_logprob_bi"] == approx((t1 + t2) / 2, abs=1e-6)


def test_bigram_logprob_rare_sequence_scores_higher(spark):
    from fuzzymatch_spark.operators.corpus import bigram_logprob

    # "a b" repeated is a high-probability sequence; "b a" never seen as
    # a bigram in doc 3's order except via backoff -> higher neg logprob
    docs = _mkdocs(spark, [
        (1, "a b a b a b a b"),
        (2, "a b a b a b"),
        (3, "b b b a a a"),
    ])
    rows = {r["doc_id"]: r["mean_neg_logprob_bi"]
            for r in bigram_logprob(docs, "doc_id", "text").collect()}
    assert rows[3] > rows[1]
    assert len(rows) == 3


# ------------------------------------------------------------- UniMax

def _unimax_ref(caps, budget):
    # brute-force waterfill reference: bisect the water level
    lo, hi = 0.0, max(caps) + 1.0
    if sum(caps) <= budget:
        return list(map(float, caps))
    for _ in range(200):
        mid = (lo + hi) / 2
        if sum(min(c, mid) for c in caps) < budget:
            lo = mid
        else:
            hi = mid
    return [min(float(c), hi) for c in caps]


def _mkdocs_grp(spark, counts):
    # one doc per (grp, token-count) pair
    rows, i = [], 0
    for grp, toks in counts:
        rows.append((i, " ".join(["t"] * toks), grp))
        i += 1
    return spark.createDataFrame(rows, "doc_id long, text string, grp string")


def test_unimax_alloc_golden_waterfill(spark):
    from pytest import approx

    from fuzzymatch_spark.operators.corpus import unimax_alloc

    # tokens: a=100 b=10 c=10 d=1000; epochs=2 -> caps 200/20/20/2000
    # budget 300: b,c saturate at 20 each; theta=(300-40)/2=130
    docs = _mkdocs_grp(spark, [
        ("a", 100), ("b", 10), ("c", 5), ("c", 5),
        ("d", 600), ("d", 400),
    ])
    out = {r["grp"]: r for r in
           unimax_alloc(docs, "grp", "text", budget_tokens=300,
                        max_epochs=2).collect()}
    assert out["b"]["alloc_tokens"] == 20.0
    assert out["c"]["alloc_tokens"] == 20.0
    assert out["a"]["alloc_tokens"] == approx(130.0)
    assert out["d"]["alloc_tokens"] == approx(130.0)
    assert out["b"]["sample_rate"] == 2.0       # epoch cap binds
    assert out["a"]["sample_rate"] == approx(1.3)
    assert out["d"]["sample_rate"] == approx(0.13)
    assert sum(r["alloc_tokens"] for r in out.values()) == approx(300.0)


def test_unimax_alloc_matches_bisect_reference(spark):
    from pytest import approx

    from fuzzymatch_spark.operators.corpus import unimax_alloc

    counts = [("g%d" % i, (i * 37) % 90 + 3) for i in range(12)]
    docs = _mkdocs_grp(spark, counts)
    budget = 250
    out = {r["grp"]: r["alloc_tokens"] for r in
           unimax_alloc(docs, "grp", "text", budget_tokens=budget,
                        max_epochs=3).collect()}
    caps = {g: t * 3 for g, t in counts}
    ref = _unimax_ref([caps[g] for g in sorted(caps)], budget)
    for g, want in zip(sorted(caps), ref):
        assert out[g] == approx(want, abs=1e-4), g


def test_unimax_alloc_budget_exceeds_capacity(spark):
    from fuzzymatch_spark.operators.corpus import unimax_alloc

    docs = _mkdocs_grp(spark, [("a", 10), ("b", 20)])
    out = {r["grp"]: r for r in
           unimax_alloc(docs, "grp", "text", budget_tokens=10_000,
                        max_epochs=2).collect()}
    assert out["a"]["alloc_tokens"] == 20.0 and out["a"]["sample_rate"] == 2.0
    assert out["b"]["alloc_tokens"] == 40.0 and out["b"]["sample_rate"] == 2.0


# -------------------------------------------------------- budget fill

def _mkdocs_scored(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, text string, grp string, score double"
    )


def test_budget_fill_greedy_prefix(spark):
    from fuzzymatch_spark.operators.corpus import budget_fill

    docs = _mkdocs_scored(spark, [
        (1, " ".join(["t"] * 5), "en", 0.9),   # rank 1, cum 5
        (2, " ".join(["t"] * 4), "en", 0.8),   # rank 2, cum 9
        (3, " ".join(["t"] * 3), "en", 0.7),   # rank 3, cum 12 > 10: out
        (4, " ".join(["t"] * 1), "en", 0.6),   # rank 4, cum 13: PREFIX
                                               # semantics -> also out
        (5, " ".join(["t"] * 2), "de", 0.1),   # own stratum, cum 2: in
    ])
    out = {r["doc_id"]: r for r in
           budget_fill(docs, "doc_id", "text", "score", 10,
                       ["grp"]).collect()}
    assert len(out) == 5
    assert [out[i]["selected"] for i in (1, 2, 3, 4, 5)] == [1, 1, 0, 0, 1]
    assert out[2]["cum_tokens"] == 9
    assert out[4]["rank"] == 4


def test_budget_fill_deterministic_tiebreak(spark):
    import hashlib

    from fuzzymatch_spark.operators.corpus import budget_fill

    # all same score: order must be md5(id), id — portable
    docs = _mkdocs_scored(
        spark, [(i, "t t", "en", 0.5) for i in range(8)]
    )
    out = sorted(
        budget_fill(docs, "doc_id", "text", "score", 6, ["grp"]).collect(),
        key=lambda r: r["rank"],
    )
    want = sorted(range(8),
                  key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
    assert [r["doc_id"] for r in out] == want
    assert sum(r["selected"] for r in out) == 3  # 6 budget / 2 tokens


def test_budget_fill_requires_partitions(spark):
    import pytest as _pytest

    from fuzzymatch_spark.operators.corpus import budget_fill

    docs = _mkdocs_scored(spark, [(1, "t", "en", 1.0)])
    with _pytest.raises(ValueError):
        budget_fill(docs, "doc_id", "text", "score", 10, [])


def test_budget_fill_monotone_in_budget(spark):
    from fuzzymatch_spark.operators.corpus import budget_fill

    docs = _mkdocs_scored(
        spark,
        [(i, " ".join(["t"] * ((i * 7) % 13 + 1)), "g%d" % (i % 3),
          float((i * 31) % 17)) for i in range(30)],
    )

    def sel(budget):
        return {r["doc_id"] for r in
                budget_fill(docs, "doc_id", "text", "score", budget,
                            ["grp"]).collect() if r["selected"] == 1}

    s10, s30, s90 = sel(10), sel(30), sel(90)
    assert s10 <= s30 <= s90  # greedy prefix: monotone in the budget
    assert len(s90) > len(s10)
