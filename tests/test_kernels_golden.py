"""Golden scoring fixtures — exact values lifted from the reference's own
tests (FIXTURES.md §2; `Tests/FuzzyMatchTests/ExactScoreVerificationTests.swift`,
`RankingQualityTests.swift`, `Documentation/SMITH_WATERMAN.md`).

These pin the numpy kernels' semantics before any Spark wiring.
"""

import numpy as np
import pytest

from fuzzymatch_spark.config import (
    EditDistanceConfig,
    GapPenalty,
    MatchConfig,
    SmithWatermanConfig,
)
from fuzzymatch_spark.kernels.bonuses import calculate_bonuses
from fuzzymatch_spark.kernels.editdist import (
    batch_substring_distance,
    normalized_score,
    prefix_edit_distance,
    substring_edit_distance,
)
from fuzzymatch_spark.kernels.scoring import prepare_query, score_pair
from fuzzymatch_spark.kernels.sw import smith_waterman_score, sw_bonus_array


def ed_cfg(**kw) -> MatchConfig:
    return MatchConfig(min_score=kw.pop("min_score", 0.3),
                       edit_distance=EditDistanceConfig(**kw))


def nb_cfg(**kw) -> MatchConfig:
    """no-bonus config used by ExactScoreVerificationTests."""
    return MatchConfig(
        min_score=kw.pop("min_score", 0.3),
        edit_distance=EditDistanceConfig.no_bonus(**kw),
    )


class TestEditDistance:
    """`Tests/FuzzyMatchTests/EditDistanceTests.swift` semantics."""

    def test_identity(self):
        assert prefix_edit_distance(b"hello", b"hello", 2) == 0
        assert substring_edit_distance(b"hello", b"hello", 2) == 0

    @pytest.mark.parametrize(
        "q,c,d",
        [
            (b"cat", b"cart", 1),   # insertion
            (b"cart", b"cat", 1),   # deletion
            (b"cat", b"bat", 1),    # substitution
            (b"teh", b"the", 1),    # transposition
            (b"abc", b"acb", 1),    # transposition
            (b"ab", b"ba", 1),      # transposition
        ],
    )
    def test_single_edits(self, q, c, d):
        assert prefix_edit_distance(q, c, 2) == d

    def test_prefix_ignores_trailing(self):
        assert prefix_edit_distance(b"get", b"getUserById".lower(), 2) == 0
        assert prefix_edit_distance(b"tge", b"getuserbyid", 2) == 1

    def test_substring_free_start(self):
        assert substring_edit_distance(b"user", b"getcurrentuser", 2) == 0
        assert substring_edit_distance(b"usr", b"getcurrentuser", 2) == 1

    def test_exceeds_max_returns_none(self):
        assert prefix_edit_distance(b"abc", b"xyz", 2) is None
        assert substring_edit_distance(b"abcdef", b"zzzzzz", 2) is None

    def test_empty_query_prefix_zero(self):
        assert prefix_edit_distance(b"", b"anything", 2) == 0

    def test_batch_matches_scalar(self):
        rng = np.random.RandomState(42)
        alphabet = b"abcdefg _x"
        qs, cs = [], []
        for _ in range(300):
            qs.append(bytes(alphabet[rng.randint(0, len(alphabet))]
                            for _ in range(rng.randint(1, 15))))
            cs.append(bytes(alphabet[rng.randint(0, len(alphabet))]
                            for _ in range(rng.randint(0, 40))))
        max_ed = 3
        batch = batch_substring_distance(qs, cs, max_ed)
        for k, (q, c) in enumerate(zip(qs, cs)):
            scalar = substring_edit_distance(q, c, max_ed)
            expect = max_ed + 1 if scalar is None else scalar
            assert batch[k] == expect, (q, c, batch[k], expect)


class TestNormalizedScore:
    def test_d1_q5_prefix_w15(self):
        # `ExactScoreVerificationTests.swift:64-75`
        s = normalized_score(1, 5, "prefix", 1.5, 1.0)
        assert abs(s - (1 - 0.2 / 1.5)) < 1e-9

    def test_d2_q5_w1(self):
        # `ExactScoreVerificationTests.swift:51-61`
        assert abs(normalized_score(2, 5, "substring", 1.5, 1.0) - 0.6) < 1e-9


class TestGoldenScores:
    def test_exact_match(self):
        # `ExactScoreVerificationTests.swift:165-186`
        assert score_pair("hello", prepare_query("hello")) == (1.0, "exact")
        assert score_pair("hElLO", prepare_query("HeLLo")) == (1.0, "exact")

    def test_prefix_test_testing(self):
        # `ExactScoreVerificationTests.swift:189-215`: d=0 prefix,
        # length pen 3*0.003=0.009, 90% recovery -> ~0.998
        cfg = nb_cfg(prefix_weight=1.5)
        score, kind = score_pair("testing", prepare_query("test", cfg))
        assert kind == "prefix"
        assert score > 0.99
        assert abs(score - (1.0 - 0.009 + 0.0081)) < 1e-9

    def test_transposed_ranks_below_exact_prefix(self):
        # `ExactScoreVerificationTests.swift:218-246`
        cfg = nb_cfg(prefix_weight=1.5)
        exact, _ = score_pair("testing", prepare_query("test", cfg))
        trans, _ = score_pair("testing", prepare_query("tset", cfg))
        assert trans < exact

    def test_substring_test_unittest(self):
        # `ExactScoreVerificationTests.swift:249-275`
        cfg = nb_cfg(substring_weight=0.9)
        score, kind = score_pair("unittest", prepare_query("test", cfg))
        assert score > 0.97
        assert kind == "substring"

    def test_helo_hello(self):
        # `ExactScoreVerificationTests.swift:278-304`: d=1 q=4 w=1 -> 0.75
        cfg = nb_cfg(prefix_weight=1.0, substring_weight=1.0, min_score=0.0)
        score, _ = score_pair("hello", prepare_query("helo", cfg))
        assert abs(score - 0.75) < 0.01

    def test_teh_the(self):
        # `ExactScoreVerificationTests.swift:307-333`: d=1 transposition,
        # same-length boost: 0.6667 + 0.3333*0.7 ~ 0.90
        cfg = nb_cfg(prefix_weight=1.0, substring_weight=1.0, min_score=0.0)
        score, _ = score_pair("the", prepare_query("teh", cfg))
        assert abs(score - 0.90) < 0.01

    def test_affine_gap_bonus(self):
        # `ExactScoreVerificationTests.swift:92-119`: positions [0,5],
        # boundary@0, affine(0.03,0.005): 0.1 - (0.03+4*0.005) = 0.05
        # (gap of 4 chars between 0 and 5 -> open + 3*extend = 0.045 per
        #  the reference formula open+(gap-1)*extend with gap=4)
        cfg = EditDistanceConfig(
            word_boundary_bonus=0.1,
            consecutive_bonus=0.05,
            gap_penalty=GapPenalty.affine(0.03, 0.005),
            first_match_bonus=0.0,
        )
        boundary = np.zeros(10, dtype=bool)
        boundary[0] = True
        bonus = calculate_bonuses([0, 5], b"abcdefghij", boundary, cfg)
        assert abs(bonus - (0.1 - (0.03 + 3 * 0.005))) < 1e-9

    def test_first_match_bonus_decay(self):
        # `ExactScoreVerificationTests.swift:122-160`
        cfg = EditDistanceConfig(
            word_boundary_bonus=0.0,
            consecutive_bonus=0.0,
            gap_penalty=GapPenalty.none(),
            first_match_bonus=0.15,
            first_match_bonus_range=10,
        )
        boundary = np.zeros(20, dtype=bool)
        assert abs(calculate_bonuses([0], b"x" * 20, boundary, cfg) - 0.15) < 1e-9
        assert abs(calculate_bonuses([5], b"x" * 20, boundary, cfg) - 0.075) < 1e-9

    def test_consecutive_run_bonus(self):
        # `ExactScoreVerificationTests.swift:395-425`: positions [0..4],
        # boundary@0: 0.1 + 4*0.05 + 0.15 = 0.45
        cfg = EditDistanceConfig(
            word_boundary_bonus=0.1,
            consecutive_bonus=0.05,
            gap_penalty=GapPenalty.linear(0.01),
            first_match_bonus=0.15,
            first_match_bonus_range=10,
        )
        boundary = np.zeros(10, dtype=bool)
        boundary[0] = True
        bonus = calculate_bonuses([0, 1, 2, 3, 4], b"abcdeabcde", boundary, cfg)
        assert abs(bonus - 0.45) < 1e-9

    def test_xsto_ranking(self):
        # `RankingQualityTests.swift:284-322`
        cfg = nb_cfg(prefix_weight=4.0, substring_weight=0.5)
        xsto, _ = score_pair("XSTO", prepare_query("xsto", cfg))
        stox = score_pair("STOX", prepare_query("xsto", cfg))
        assert xsto == 1.0
        assert stox is not None and 0.9 < stox[0] < 1.0

    def test_acronym_bms(self):
        # `Documentation/DAMERAU_LEVENSHTEIN.md:659-670`:
        # 0.55 + 0.4*(3/3) = 0.95
        score, kind = score_pair(
            "Bristol-Myers Squibb", prepare_query("bms", MatchConfig())
        )
        assert kind == "acronym"
        assert abs(score - 0.95) < 1e-9

    def test_gubi_matches_getuserbyid_not_debugging(self):
        # `RankingQualityTests.swift:64-71`
        q = prepare_query("gubi", MatchConfig())
        assert score_pair("getUserById", q) is not None
        assert score_pair("debugging", q) is None

    def test_empty_query_exact(self):
        assert score_pair("anything", prepare_query("")) == (1.0, "exact")

    def test_self_match_invariant(self):
        for s in ["hello world", "getUserById", "a", "Ärger", "москва", "Σίγμα"]:
            got = score_pair(s, prepare_query(s))
            assert got == (1.0, "exact"), s


class TestSmithWaterman:
    def test_foo_bar_trace(self):
        # `Documentation/SMITH_WATERMAN.md:265-291`: b=32, a=56, r=80
        sw = SmithWatermanConfig()
        norm, bonus = sw_bonus_array(b"foo_bar", sw)
        assert norm == b"foo_bar"
        assert smith_waterman_score(b"bar", norm, bonus, sw) == 80

    def test_max_score_q4(self):
        # `Documentation/SMITH_WATERMAN.md:313-317`: 4*16 + 10*(2+3) = 114
        cfg = MatchConfig(algorithm="smithWaterman")
        q = prepare_query("getx", cfg)
        assert q.max_sw_score == 114

    def test_sw_exact(self):
        cfg = MatchConfig(algorithm="smithWaterman")
        assert score_pair("hello", prepare_query("hello", cfg)) == (1.0, "exact")

    def test_sw_multi_atom_and_semantics(self):
        # `FuzzyMatcher+SmithWaterman.swift:289-316`: every atom must match
        cfg = MatchConfig(algorithm="smithWaterman")
        q = prepare_query("goldman sachs", cfg)
        assert score_pair("Goldman Sachs Group Inc", q) is not None
        assert score_pair("Goldman Group Inc", q) is None

    def test_sw_bonus_tiers(self):
        # whitespace 10 / delimiter 9 / boundary 8 / camelCase 5
        sw = SmithWatermanConfig()
        _, bonus = sw_bonus_array(b"a b/c_dE", sw)
        # pos0 'a'=10(start), ' '=10, 'b' after ws=10, '/'=8(non-word),
        # 'c' after delim=9, '_'=8, 'd' after _=8, 'E' camel=5
        assert list(bonus) == [10, 10, 10, 8, 9, 8, 8, 5]


class TestInvariants:
    """Mirrors the 5 fuzz invariants (`Fuzz/FuzzyMatchFuzz.swift:91-133`)."""

    CONFIGS = [
        MatchConfig(),
        MatchConfig(min_score=0.0),
        MatchConfig(min_score=0.7),
        nb_cfg(),
        MatchConfig(algorithm="smithWaterman"),
        MatchConfig(algorithm="smithWaterman", min_score=0.0),
        ed_cfg(prefix_weight=4.0, substring_weight=0.5),
        ed_cfg(max_edit_distance=1),
        ed_cfg(gap_penalty=GapPenalty.linear(0.01)),
        ed_cfg(first_match_bonus=0.0),
    ]

    def test_invariants_random(self):
        rng = np.random.RandomState(7)
        pool = "abc XYZ_01-Ärgerµ/σ"
        for trial in range(200):
            cfg = self.CONFIGS[trial % len(self.CONFIGS)]
            qs = "".join(rng.choice(list(pool)) for _ in range(rng.randint(0, 10)))
            cs = "".join(rng.choice(list(pool)) for _ in range(rng.randint(0, 30)))
            q = prepare_query(qs, cfg)
            r1 = score_pair(cs, q)
            r2 = score_pair(cs, q)
            assert r1 == r2  # determinism
            if r1 is not None:
                score, kind = r1
                assert 0.0 <= score <= 1.0
                assert score >= cfg.min_score
                assert kind in ("exact", "prefix", "substring", "acronym", "alignment")
            if len(qs) == 0:
                assert r1 == (1.0, "exact")
            # self-match
            assert score_pair(qs, prepare_query(qs, cfg)) == (1.0, "exact") or qs == ""
