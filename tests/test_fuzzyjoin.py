"""PassJoin-blocked fuzzy token self-join: recall completeness vs brute
force, and the blocking's candidate-count win over plain length banding."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.operators.fuzzyjoin import (
    fuzzy_token_candidates,
    fuzzy_token_join,
)

LETTERS = "abcdefghijklmnopqrstuvwxyz"


def _vocab(rng, n, lmin=6, lmax=10):
    toks = set()
    while len(toks) < n:
        ln = rng.randint(lmin, lmax + 1)
        toks.add("".join(LETTERS[rng.randint(0, 26)] for _ in range(ln)))
    return sorted(toks)


def _typo(rng, t):
    ops = rng.randint(0, 3)
    chars = list(t)
    if ops == 0 and len(chars) > 1:  # delete
        chars.pop(rng.randint(0, len(chars)))
    elif ops == 1:  # substitute
        chars[rng.randint(0, len(chars))] = LETTERS[rng.randint(0, 26)]
    else:  # insert
        chars.insert(rng.randint(0, len(chars) + 1), LETTERS[rng.randint(0, 26)])
    return "".join(chars)


def _brute_pairs(tokens, max_ed):
    from fuzzymatch_spark.kernels.editdist import batch_levenshtein

    toks = sorted(tokens)
    qa, qb = [], []
    pairs = []
    for i, a in enumerate(toks):
        for b in toks[i + 1 :]:
            if abs(len(a) - len(b)) <= max_ed:
                qa.append(a.encode())
                qb.append(b.encode())
                pairs.append((a, b))
    dist = batch_levenshtein(qa, qb, max_ed)
    return {
        (a, b, int(d)) for (a, b), d in zip(pairs, dist) if d <= max_ed
    }


@pytest.mark.parametrize("max_ed", [1, 2])
def test_passjoin_recall_complete(spark, max_ed):
    """Planted typos (including short tokens) all recovered; result equals
    the brute-force all-pairs Levenshtein set exactly."""
    rng = np.random.RandomState(7)
    base = _vocab(rng, 300) + ["a", "ab", "abc", "xy", "x"]
    typos = [_typo(rng, t) for t in base[:80]]
    tokens = sorted(set(base + typos))
    df = spark.createDataFrame([(t,) for t in tokens], "token string")

    got = {
        (r["a_token"], r["b_token"], r["dist"])
        for r in fuzzy_token_join(df, "token", max_ed=max_ed).collect()
    }
    assert got == _brute_pairs(tokens, max_ed)


def test_passjoin_candidate_shrink(spark):
    """On a realistic vocabulary (2k random 6-10 char tokens) the segment
    blocking must cut candidate pairs >= 10x vs plain length banding."""
    max_ed = 2
    rng = np.random.RandomState(11)
    tokens = _vocab(rng, 2000)
    df = spark.createDataFrame([(t,) for t in tokens], "token string")

    cand = fuzzy_token_candidates(df, max_ed).count()

    # plain length-band candidate count (the old blocking), computed from
    # the length histogram instead of materializing the quadratic join
    from collections import Counter

    hist = Counter(len(t) for t in tokens)
    length_band = 0
    for la, ca in hist.items():
        for lb, cb in hist.items():
            if la < lb <= la + max_ed:
                length_band += ca * cb
        length_band += ca * (ca - 1) // 2  # same-length pairs
    assert cand * 10 <= length_band, (cand, length_band)
