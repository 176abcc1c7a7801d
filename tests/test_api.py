"""Reference-parity convenience API (`FuzzyMatcher+Convenience.swift`) and
the TSV corpus source (`CorpusBenchmark.swift:63-92` field pools)."""

from fuzzymatch_spark import MatchConfig, api
from fuzzymatch_spark.sources.tsv import read_corpus_tsv


def test_score_one_shot():
    assert api.score("stream", "stream") == (1.0, "exact")
    s = api.score("stream", "straem")
    assert s is not None and s[0] > 0.9 and s[1] == "prefix"
    assert api.score("zzz", "straem") is None
    sw = api.score("foo_bar", "fb",
                   config=MatchConfig(algorithm="smithWaterman", min_score=0.1))
    assert sw is not None


def test_score_many_matches_scalar():
    cands = ["stream", "straem", "batch", "", "Σίγμα"]
    got = api.score_many(cands, "stream")
    want = [api.score(c, "stream") for c in cands]
    assert got == want


def test_matches_and_top_matches_reexports(spark, documents):
    out = api.top_matches(documents, "text", "stream batch", k=3,
                          config=MatchConfig(min_score=0.2))
    rows = out.collect()
    assert 0 < len(rows) <= 3
    m = api.matches(documents, "text", "stream batch",
                    MatchConfig(min_score=0.2))
    assert m.count() >= len(rows)


def test_read_corpus_tsv(spark, tmp_path):
    p = tmp_path / "corpus.tsv"
    p.write_text("AAPL\tApple Inc\tUS0378331005\n"
                 "MSFT\tMicrosoft Corp\tUS5949181045\n")
    df = read_corpus_tsv(spark, str(p))
    assert df.columns == ["symbol", "name", "isin"]
    rows = {r["symbol"]: (r["name"], r["isin"]) for r in df.collect()}
    assert rows["AAPL"] == ("Apple Inc", "US0378331005")

    # header mode + explicit columns
    p2 = tmp_path / "c2.tsv"
    p2.write_text("sym\tnm\nX\tY\n")
    df2 = read_corpus_tsv(spark, str(p2), columns=["s", "n"], header=True)
    assert df2.columns == ["s", "n"] and df2.count() == 1
