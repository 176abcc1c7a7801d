"""Fuzz-parity for the corpus operators: one deterministic random corpus
(Unicode, empty strings, doubled separators, punctuation) checked against
independent pure-Python reference implementations — a third opinion next
to the golden tests and the DuckDB oracles."""

import random
from collections import Counter

from fuzzymatch_spark.operators.corpus import (
    _HASH_MOD,
    chunk_documents,
    hash_vectorize,
    repetition_stats,
)

WORDS = ["spark", "join", "x", "東京", "café", "žluť", "a-b", "42", "!!",
         "loop"]


def _fuzz_rows(n=200, seed=99):
    rng = random.Random(seed)
    rows = []
    for i in range(n):
        k = rng.randrange(0, 40)
        toks = [rng.choice(WORDS) for _ in range(k)]
        text = " ".join(toks)
        if rng.random() < 0.1 and text:
            text += " "          # trailing separator -> empty token
        rows.append((i, text))
    rows.append((n, ""))          # fully empty doc
    rows.append((n + 1, "  "))    # only separators
    return rows


def _ref_repetition(text):
    toks = text.split(" ")
    n1 = len(toks)
    g2 = [" ".join(toks[i:i + 2]) for i in range(len(toks) - 1)]
    g3 = [" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)]
    c1, c2, c3 = Counter(toks), Counter(g2), Counter(g3)
    top1 = round(max(c1.values()) / max(n1, 1), 6)
    top2 = round(max(c2.values()) / len(g2), 6) if g2 else 0.0
    ex2 = round(1 - len(c2) / len(g2), 6) if g2 else 0.0
    dup3 = (
        round(sum(v for v in c3.values() if v >= 2) / len(g3), 6)
        if g3 else 0.0
    )
    return top1, top2, ex2, dup3


def _ref_bucket(tok, dim):
    acc = 0
    for ch in tok:
        acc = (acc * 31 + ord(ch)) % _HASH_MOD
    return acc % dim


def test_repetition_stats_fuzz_parity(spark):
    rows = _fuzz_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in
           repetition_stats(df, "doc_id", "text").collect()}
    assert len(got) == len(rows)
    for i, text in rows:
        t1, t2, e2, d3 = _ref_repetition(text)
        r = got[i]
        assert (r["top_unigram_frac"], r["top_2gram_frac"],
                r["excess_2gram_frac"], r["dup_3gram_frac"]) == \
            (t1, t2, e2, d3), (i, repr(text))


def test_hash_vectorize_fuzz_parity(spark):
    rows = _fuzz_rows()
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["vec_id"]: r["embedding"] for r in
           hash_vectorize(df, "doc_id", "text", dim=16).collect()}
    for i, text in rows:
        want = [0.0] * 16
        for tok in text.split(" "):
            if tok:
                want[_ref_bucket(tok, 16)] += 1
        assert got[i] == want, (i, repr(text))


def test_chunk_documents_fuzz_parity(spark):
    rows = [(i, t) for i, t in _fuzz_rows() if t.split(" ")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, "doc_id", "text", chunk_tokens=7, overlap=2)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_id"], r["start_token"], r["chunk_text"])
        )
    for i, text in rows:
        toks = text.split(" ")
        stride = 5
        n = len(toks)
        k = 1 if n <= 7 else (n - 7 + stride - 1) // stride + 1
        want = [
            (c, c * stride, " ".join(toks[c * stride:c * stride + 7]))
            for c in range(k)
        ]
        assert sorted(got[i]) == want, (i, repr(text))
