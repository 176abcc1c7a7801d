"""Reference-parity convenience API.

The reference exposes three entry points
(`Sources/FuzzyMatch/FuzzyMatcher+Convenience.swift`):

* ``score(candidate, against:)``        (`:19-38`)  — one-shot pair score
* ``matches(in:against:)``              (`:116-131`) — all candidates >= minScore
* ``topMatches(in:against:limit:)``     (`:65-95`)  — ranked top-k

A reference user switches by calling the same three verbs here: ``score``
stays a local (driver-side) call on the identical kernel the distributed
path uses; ``matches`` / ``top_matches`` take a DataFrame + column instead
of an in-memory array.  ``score_many`` is the batch form of ``score``
(one BatchCandidates pass — the same code the Arrow UDFs run).
"""

from __future__ import annotations

from fuzzymatch_spark.config import MatchConfig
from fuzzymatch_spark.kernels.batch_scoring import (
    BatchCandidates,
    batch_score_pairs,
)
from fuzzymatch_spark.kernels.scoring import prepare_query, score_pair
from fuzzymatch_spark.operators.topk import (
    score_candidates as matches,  # reference naming: `matches`
    top_matches,
    top_matches_bulk,
    top_matches_fields,
    top_matches_multi,
)

__all__ = [
    "score",
    "score_many",
    "matches",
    "top_matches",
    "top_matches_bulk",
    "top_matches_fields",
    "top_matches_multi",
]


def score(
    candidate: str, against: str, config: MatchConfig | None = None
) -> tuple[float, str] | None:
    """One-shot pair score: (score, kind), or None below minScore /
    filtered.  Local call — no SparkSession needed."""
    q = prepare_query(against, config or MatchConfig())
    return score_pair(candidate.encode("utf-8"), q)


def score_many(
    candidates: list[str], against: str, config: MatchConfig | None = None
) -> list[tuple[float, str] | None]:
    """Batch form of ``score`` over a list — one vectorized pass."""
    import numpy as np

    q = prepare_query(against, config or MatchConfig())
    cands = BatchCandidates([c.encode("utf-8") for c in candidates])
    scores, kinds = batch_score_pairs(cands, q)
    return [
        None if np.isnan(scores[k]) else (float(scores[k]), kinds[k])
        for k in range(len(candidates))
    ]
