"""Batch scorer == scalar scorer, property-tested over the full phase
pipeline (prefilters, exact, prefix/substring DL, subsequence, acronym,
bonuses) across configs, scripts, and adversarial string shapes.

The scalar ``score_pair`` is the golden-fixture-pinned reference
implementation (tests/test_kernels_golden.py); ``batch_score_pairs`` must be
bit-identical to it on every row — same floats, same kinds, same rejects.
"""

import numpy as np
import pytest

from fuzzymatch_spark.config import EditDistanceConfig, MatchConfig
from fuzzymatch_spark.kernels.batch_scoring import (
    BatchCandidates,
    batch_score_pairs,
)
from fuzzymatch_spark.kernels.scoring import prepare_query, score_pair

WORDS = (
    "spark shuffle partition join window batch stream table scan merge sort "
    "hash key order fast small dup near exact image caption pixel frame "
    "Goldman Sachs Group Alpha Industries fooBar snake_case UPPER 42x"
).split()

EDGE_STRINGS = [
    "", " ", "a", "ab", "a b c", "___", "straem", "stream", "Stream",
    "the stream processor", "str", "s", "b m s", "bms corp",
    "ba", "aaaa", "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
    "Crème brûlée", "Σίγμα", "Москва city", "naïve user", "café",
    "x" * 300, ("word " * 80).strip(),
]


def _mutate(rng, s: str) -> str:
    if len(s) < 3:
        return s + "x"
    ops = rng.randint(4)
    chars = list(s)
    p = rng.randint(0, len(chars) - 2)
    if ops == 0:  # transpose
        chars[p], chars[p + 1] = chars[p + 1], chars[p]
    elif ops == 1:  # delete
        del chars[p]
    elif ops == 2:  # insert
        chars.insert(p, "z")
    else:  # substitute
        chars[p] = "q"
    return "".join(chars)


def _corpus(rng, n=120) -> list[str]:
    rows = list(EDGE_STRINGS)
    for _ in range(n):
        nw = rng.randint(1, 6)
        rows.append(" ".join(WORDS[rng.randint(len(WORDS))] for _ in range(nw)))
    return rows


def _queries(rng, corpus) -> list[str]:
    qs = ["", "a", "ab", "bms", "straem", "stream batch", "Crème", "Σίγμα"]
    for _ in range(25):
        base = corpus[rng.randint(len(corpus))]
        r = rng.rand()
        if r < 0.3:
            qs.append(_mutate(rng, base))
        elif r < 0.5:
            qs.append(base[: max(1, len(base) // 2)])  # prefix
        elif r < 0.7:
            qs.append(base[len(base) // 3 : 2 * len(base) // 3])  # substring
        elif r < 0.85 and " " in base:
            qs.append("".join(w[0] for w in base.split() if w))  # acronym
        else:
            qs.append(base)
    return qs


CONFIGS = [
    MatchConfig(),  # reference defaults (bonuses + affine gaps)
    MatchConfig(min_score=0.1),
    MatchConfig(min_score=0.6),
    MatchConfig(edit_distance=EditDistanceConfig.no_bonus()),
    MatchConfig(edit_distance=EditDistanceConfig.fzf_aligned()),
    MatchConfig(algorithm="smithWaterman", min_score=0.1),
    MatchConfig(algorithm="smithWaterman", min_score=0.3),
]


@pytest.mark.parametrize("cfg_i", range(len(CONFIGS)))
def test_batch_equals_scalar(cfg_i):
    cfg = CONFIGS[cfg_i]
    rng = np.random.RandomState(100 + cfg_i)
    corpus = _corpus(rng)
    raws = [c.encode("utf-8") for c in corpus]
    cands = BatchCandidates(raws)
    n_scored = 0
    for qt in _queries(rng, corpus):
        q = prepare_query(qt, cfg)
        scores, kinds = batch_score_pairs(cands, q)
        for k, raw in enumerate(raws):
            want = score_pair(raw, q)
            got = (
                None if np.isnan(scores[k]) else (float(scores[k]), kinds[k])
            )
            assert got == want, (
                f"cfg{cfg_i} query={qt!r} cand={corpus[k]!r}: "
                f"batch={got} scalar={want}"
            )
            if want is not None:
                n_scored += 1
    assert n_scored > 50  # the workload actually exercises matches


def test_batch_empty_and_degenerate():
    cfg = MatchConfig()
    cands = BatchCandidates([])
    q = prepare_query("abc", cfg)
    scores, kinds = batch_score_pairs(cands, q)
    assert scores.shape == (0,) and kinds == []

    cands1 = BatchCandidates([b"", b"abc"])
    s, k = batch_score_pairs(cands1, prepare_query("", cfg))
    # empty query matches everything exactly (reference semantics)
    assert k == ["exact", "exact"] and (s == 1.0).all()


def test_batch_levenshtein_matches_reference_impl():
    """Plain-Levenshtein batch kernel vs a trivial O(nm) scalar DP."""
    from fuzzymatch_spark.kernels.editdist import batch_levenshtein

    def slow_lev(a: bytes, b: bytes) -> int:
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a):
            cur = [i + 1]
            for j, cb in enumerate(b):
                cur.append(min(prev[j + 1] + 1, cur[j] + 1,
                               prev[j] + (ca != cb)))
            prev = cur
        return prev[-1]

    rng = np.random.RandomState(5)
    words = [b"", b"a", b"spark", b"sprk", b"shuffle", b"shuffel",
             b"partition", b"partitoin", b"stream", b"straem", b"batch"]
    pairs = [(words[rng.randint(len(words))], words[rng.randint(len(words))])
             for _ in range(300)]
    for max_ed in (0, 1, 2, 5):
        got = batch_levenshtein([p[0] for p in pairs],
                                [p[1] for p in pairs], max_ed)
        for k, (a, b) in enumerate(pairs):
            want = min(slow_lev(a, b), max_ed + 1)
            assert got[k] == want, (a, b, max_ed, got[k], want)
