"""Match configuration dataclasses.

Mirrors the reference's Codable config surface
(`Sources/FuzzyMatch/MatchConfig.swift:525-693`,
`Sources/FuzzyMatch/SmithWatermanConfig.swift:99-146`) so configs round-trip
through JSON and can be broadcast to executors and persisted in a
``run_config`` lineage table.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass, field
from typing import Literal


@dataclass(frozen=True)
class GapPenalty:
    """Gap penalty model for bonus calculation.

    kind='none'  : no penalty
    kind='linear': ``per_char`` per gap character
    kind='affine': ``open`` for the first gap char + ``extend`` per additional
    (reference default: affine(0.03, 0.005), `MatchConfig.swift:153`)
    """

    kind: Literal["none", "linear", "affine"] = "affine"
    open: float = 0.03
    extend: float = 0.005
    per_char: float = 0.0

    @staticmethod
    def none() -> "GapPenalty":
        return GapPenalty(kind="none", open=0.0, extend=0.0)

    @staticmethod
    def linear(per_char: float) -> "GapPenalty":
        return GapPenalty(kind="linear", per_char=per_char)

    @staticmethod
    def affine(open: float, extend: float) -> "GapPenalty":
        return GapPenalty(kind="affine", open=open, extend=extend)


@dataclass(frozen=True)
class EditDistanceConfig:
    """Damerau-Levenshtein scoring knobs.

    Defaults match the reference (`Sources/FuzzyMatch/MatchConfig.swift:525-551`).
    """

    max_edit_distance: int = 2
    long_query_max_edit_distance: int = 3
    long_query_threshold: int = 13
    prefix_weight: float = 1.5
    substring_weight: float = 1.0
    word_boundary_bonus: float = 0.1
    consecutive_bonus: float = 0.05
    gap_penalty: GapPenalty = field(default_factory=GapPenalty)
    first_match_bonus: float = 0.15
    first_match_bonus_range: int = 10
    length_penalty: float = 0.003
    acronym_weight: float = 1.0

    @property
    def needs_alignment(self) -> bool:
        return (
            self.word_boundary_bonus > 0
            or self.consecutive_bonus > 0
            or self.gap_penalty.kind != "none"
            or self.first_match_bonus > 0
        )

    @staticmethod
    def fzf_aligned() -> "EditDistanceConfig":
        """The reference's fzfAligned preset (`MatchConfig.swift:474-478`):
        fzf's integer ratios mapped to the 0-1 scale."""
        return EditDistanceConfig(
            word_boundary_bonus=0.12,
            consecutive_bonus=0.06,
            gap_penalty=GapPenalty.affine(0.04, 0.012),
        )

    @staticmethod
    def no_bonus(
        prefix_weight: float = 1.5, substring_weight: float = 1.0, **kw
    ) -> "EditDistanceConfig":
        """All bonuses zero, gap penalty none — used by golden fixtures."""
        return EditDistanceConfig(
            prefix_weight=prefix_weight,
            substring_weight=substring_weight,
            word_boundary_bonus=0.0,
            consecutive_bonus=0.0,
            gap_penalty=GapPenalty.none(),
            first_match_bonus=0.0,
            **kw,
        )


@dataclass(frozen=True)
class SmithWatermanConfig:
    """Integer constants for the SW kernel
    (`Sources/FuzzyMatch/SmithWatermanConfig.swift:99-146`)."""

    score_match: int = 16
    penalty_gap_start: int = 3
    penalty_gap_extend: int = 1
    bonus_consecutive: int = 4
    bonus_boundary: int = 8
    bonus_boundary_whitespace: int = 10
    bonus_boundary_delimiter: int = 9
    bonus_camel_case: int = 5
    bonus_first_char_multiplier: int = 2
    split_spaces: bool = True


@dataclass(frozen=True)
class MatchConfig:
    """Top-level config: threshold + algorithm choice
    (`Sources/FuzzyMatch/MatchConfig.swift:598-693`, default minScore 0.3
    at `MatchConfig.swift:671`)."""

    min_score: float = 0.3
    algorithm: Literal["editDistance", "smithWaterman"] = "editDistance"
    edit_distance: EditDistanceConfig = field(default_factory=EditDistanceConfig)
    smith_waterman: SmithWatermanConfig = field(default_factory=SmithWatermanConfig)

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @staticmethod
    def from_json(s: str) -> "MatchConfig":
        d = json.loads(s)
        ed = d.get("edit_distance", {})
        gp = ed.pop("gap_penalty", None)
        if gp is not None:
            ed["gap_penalty"] = GapPenalty(**gp)
        sw = d.get("smith_waterman", {})
        return MatchConfig(
            min_score=d.get("min_score", 0.3),
            algorithm=d.get("algorithm", "editDistance"),
            edit_distance=EditDistanceConfig(**ed),
            smith_waterman=SmithWatermanConfig(**sw),
        )


@dataclass(frozen=True)
class DedupConfig:
    """Engine-only knobs for the near-duplicate pipeline (north rule).

    shingle_size / num_perm / bands x rows control MinHash LSH; a pair with
    trigram-Jaccard >= ``jaccard_threshold`` is a duplicate edge.  pHash pairs
    within ``phash_max_hamming`` bits are duplicate edges.  Band parameters
    must satisfy bands * rows == num_perm.
    """

    shingle_size: int = 3
    num_perm: int = 128
    bands: int = 32
    rows_per_band: int = 4
    jaccard_threshold: float = 0.6
    phash_max_hamming: int = 6
    simhash_max_hamming: int = 3
    min_score: float = 0.75  # DL-score threshold for verified caption edges
    # DL verification is a typo-scale check (the reference scores short
    # identifier-like strings); for longer texts near-dup similarity is the
    # Jaccard path.  Pairs whose shorter side exceeds this length skip the
    # DP entirely — at 10^12 rows an O(n*m) DP on kilobyte strings is never
    # the right verifier.
    dl_max_len: int = 128
    # SimHash banding as an ADDITIONAL candidate source in candidate_edges.
    # Default off: measured on the dense corpus at sf0.1 it contributed 3
    # of 948,411 verified edges (0.0003%) that MinHash+exact missed, while
    # costing ~1/3 of total candidate-generation time (the C(8,5)=56
    # combination keys explode 7x more band rows than MinHash's 8 bands).
    # The standalone operator (simhash_band_edges) is unaffected — enable
    # here when the corpus has token-permuted near-dups that shingle
    # MinHash under-covers.
    simhash_candidates: bool = False
    max_bucket_size: int = 2000  # salt/cap hot LSH buckets beyond this
    # Density-adaptive control for the pHash Hamming edge stage: keep at
    # most this many nearest neighbors (by Hamming distance, ties by id)
    # per image; an edge survives if EITHER endpoint ranks it within the
    # cap.  Bounds edge volume to cap*N — linear in corpus size — where a
    # fixed radius grows quadratically on background near-collisions
    # (measured ×7.1 edges for ×4 images at radius 6, BENCH.md).  Planted
    # twins are their own nearest neighbors, so recall is unaffected at
    # any sane cap.  None = pure radius semantics (the oracle default —
    # `image_dedup_suite` 'hamming' section stays hash-exact).
    phash_degree_cap: int | None = None
    # Tier-2 verify threshold on an independent digest (dhash64), active
    # when phash_band_edges(verify_col=...) names a stored digest column.
    # Measured on the synth corpus (histogram over all tier-1 pairs at
    # 400k AND 1.6M images): planted twins (same pixels, lossy re-encode)
    # max out at dHash distance 4; random pHash near-collisions center
    # ~32 bits and only 9,139 of 462k fall <= 8 at 1.6M.  At 8 the edge
    # growth for x4 images drops from the uncapped x7.12 to x4.08 —
    # essentially linear — with twin recall 1.0 at both scales.
    phash_verify_max_hamming: int = 8
    suffix_min_run: int = 20  # min shared-substring length for suffix stage
    seed: int = 42

    def __post_init__(self) -> None:
        assert self.bands * self.rows_per_band == self.num_perm, (
            "bands * rows_per_band must equal num_perm"
        )

    def to_json(self) -> str:
        return json.dumps(asdict(self), sort_keys=True)

    @staticmethod
    def web_dense() -> "DedupConfig":
        """Profile for dense/boilerplate-heavy corpora: long rows per band
        push the LSH S-curve midpoint to (1/b)^(1/r) = (1/8)^(1/16) ~ 0.88,
        so background pairs (J ~ 0.5-0.7) rarely collide while J >= 0.95
        near-dups collide with >= 99% probability.  Use when background
        pairwise similarity is high — the recall-oriented default explodes
        candidates on such data."""
        return DedupConfig(
            num_perm=128, bands=8, rows_per_band=16,
            jaccard_threshold=0.9, min_score=0.9,
        )
