"""Reference-parity pair scorer (Damerau-Levenshtein pipeline).

Reproduces the full phase orchestration of the reference's
``scoreImpl`` (`Sources/FuzzyMatch/FuzzyMatcher.swift:350-501`):

    empty cases -> length filter -> char-bitmask filter -> normalize ->
    trigram filter -> exact -> prefix -> substring -> subsequence ->
    acronym -> minScore threshold

with every cap / boost / recovery constant:

* same-length near-exact boost ``score += (1-score)*0.7`` (`:566-568`)
* short-query (<=3) same-length restriction (`:551`, `:644`)
* bonus cap: non-exact recovers at most 80% of the gap to 1.0 (`:584-589`)
* length penalty ``(cLen-qLen)*lengthPenalty`` with 90% exact-prefix recovery
  capped at 0.15 (`:594-602`) and 80% whole-word-substring recovery (`:724-744`)
* substring phase gate ``bestScore < 0.7 and prefixDistance != 0`` (`:632`)
* subsequence phase gate ``bestScore < minScore`` (`:770`), gap-ratio base
  ``max(0.3, 1-gaps/cLen) * substringWeight`` (`:801-811`)
* acronym: qLen 2..8, >=3 words, ``(0.55 + 0.4*coverage) * acronymWeight``
  (`:832-902`)

Used directly for golden-fixture tests and inside the ``top_matches``
pandas UDF after the cheap column prefilters have cut the candidate set.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from fuzzymatch_spark.config import EditDistanceConfig, MatchConfig, SmithWatermanConfig
from fuzzymatch_spark.kernels.boundary import boundary_array, is_word_boundary
from fuzzymatch_spark.kernels.bonuses import (
    calculate_bonuses,
    find_contiguous_substring,
    find_match_positions,
    optimal_alignment,
)
from fuzzymatch_spark.kernels.editdist import (
    normalized_score,
    prefix_edit_distance,
    substring_edit_distance,
)
from fuzzymatch_spark.kernels.normalize import char_bitmask, normalize_bytes, popcount
from fuzzymatch_spark.kernels.trigrams import passes_trigram_filter, trigram_set


@dataclass
class PreparedQuery:
    """The reference's FuzzyQuery (`Sources/FuzzyMatch/FuzzyQuery.swift:50-188`)."""

    original: str
    lowered: bytes
    bitmask: int
    trigrams: np.ndarray
    contains_spaces: bool
    config: MatchConfig
    effective_max_ed: int = 0
    bitmask_tolerance: int = 0
    min_candidate_length: int = 0
    max_sw_score: int = 0
    atoms: list[bytes] = field(default_factory=list)


def prepare_query(query: str, config: MatchConfig | None = None) -> PreparedQuery:
    config = config or MatchConfig()
    lowered = normalize_bytes(query.encode("utf-8"))
    qlen = len(lowered)
    mask = char_bitmask(lowered)
    contains_spaces = b" " in lowered
    trigrams = trigram_set(lowered) if qlen >= 3 else np.empty(0, dtype=np.uint32)
    pq = PreparedQuery(
        original=query,
        lowered=lowered,
        bitmask=mask,
        trigrams=trigrams,
        contains_spaces=contains_spaces,
        config=config,
    )
    if config.algorithm == "editDistance":
        ed = config.edit_distance
        max_ed = (
            ed.long_query_max_edit_distance
            if qlen >= ed.long_query_threshold
            else ed.max_edit_distance
        )
        emed = min(max_ed, max(1, (qlen - 1) // 2))
        pq.effective_max_ed = emed
        pq.bitmask_tolerance = 0 if qlen <= 3 else emed
        pq.min_candidate_length = qlen - emed
    else:
        sw = config.smith_waterman
        if contains_spaces and sw.split_spaces:
            pq.atoms = [a for a in lowered.split(b" ") if a]
        if qlen > 0:
            if len(pq.atoms) > 1:
                pq.max_sw_score = sum(
                    len(a) * sw.score_match
                    + sw.bonus_boundary_whitespace
                    * (sw.bonus_first_char_multiplier + len(a) - 1)
                    for a in pq.atoms
                )
            else:
                pq.max_sw_score = qlen * sw.score_match + (
                    sw.bonus_boundary_whitespace
                    * (sw.bonus_first_char_multiplier + qlen - 1)
                )
    return pq


class _State:
    __slots__ = (
        "best_score",
        "best_kind",
        "cached_positions",
        "cached_bonus",
        "needs_alignment",
        "boundary",
        "effective_max_ed",
    )

    def __init__(self) -> None:
        self.best_score = -1.0
        self.best_kind = "prefix"
        self.cached_positions: list[int] | None = None
        self.cached_bonus = 0.0
        self.needs_alignment = False
        self.boundary: np.ndarray | None = None
        self.effective_max_ed = 0


def _alignment_if_needed(
    query: bytes, candidate: bytes, state: _State, ed: EditDistanceConfig
) -> tuple[list[int], float]:
    if state.cached_positions is not None:
        return state.cached_positions, state.cached_bonus
    if len(query) <= 4:
        positions = find_match_positions(query, candidate, state.boundary)
        bonus = (
            calculate_bonuses(positions, candidate, state.boundary, ed)
            if positions
            else 0.0
        )
    else:
        positions, bonus = optimal_alignment(query, candidate, state.boundary, ed)
    state.cached_positions = positions
    state.cached_bonus = bonus
    return positions, bonus


def score_pair(
    candidate: str | bytes,
    query: PreparedQuery,
) -> tuple[float, str] | None:
    """Score one candidate; None when filtered out or below minScore."""
    raw = candidate.encode("utf-8") if isinstance(candidate, str) else candidate
    if query.config.algorithm == "smithWaterman":
        from fuzzymatch_spark.kernels.sw import score_smith_waterman

        return score_smith_waterman(raw, query)
    return _score_edit_distance(raw, query)


def _score_edit_distance(raw: bytes, query: PreparedQuery):
    ed = query.config.edit_distance
    min_score = query.config.min_score
    qbytes = query.lowered
    qlen = len(qbytes)
    clen_raw = len(raw)

    if qlen == 0:
        return (1.0, "exact")
    if clen_raw == 0:
        return None
    if qlen == 1:
        return _score_tiny_query1(raw, qbytes[0], ed, min_score)

    # Prefilter 1: length bounds (raw byte length, like the reference)
    if clen_raw < query.min_candidate_length:
        return None

    # Prefilter 2: char bitmask on raw bytes (case-insensitive mask)
    cand_mask = char_bitmask(normalize_bytes(raw)) if not raw.isascii() else char_bitmask(
        raw.translate(_ASCII_LOWER_LOCAL)
    )
    if popcount(query.bitmask & ~cand_mask) > query.bitmask_tolerance:
        return None

    norm = normalize_bytes(raw)
    clen = len(norm)

    # Prefilter 3: trigrams
    emed = query.effective_max_ed
    if qlen >= 4 and query.trigrams.size > 3 * emed:
        if not passes_trigram_filter(norm, query.trigrams, emed):
            return None

    # Phase 2: exact
    if norm == qbytes:
        return (1.0, "exact")

    return run_phases(raw, norm, query)


_UNSET = object()  # sentinel: "distance not precomputed — run the DP here"


def run_phases(
    raw: bytes,
    norm: bytes,
    query: PreparedQuery,
    prefix_distance=_UNSET,
    substring_distance=_UNSET,
) -> tuple[float, str] | None:
    """Phases 3-6 (prefix/substring/subsequence/acronym) + minScore gate.

    The single arithmetic code path shared by the scalar ``score_pair`` and
    the batch scorer (kernels/batch_scoring.py): the batch path precomputes
    the two DL distances across the whole Arrow batch and injects them here,
    so scalar and batch scoring cannot diverge.
    """
    ed = query.config.edit_distance
    qbytes = query.lowered
    state = _State()
    state.boundary = boundary_array(raw, norm)
    state.effective_max_ed = query.effective_max_ed
    state.needs_alignment = ed.needs_alignment

    # Phase 3: prefix
    pd = _score_prefix(qbytes, norm, query, ed, state, distance=prefix_distance)
    # Phase 4: substring
    _score_substring(qbytes, norm, query, ed, state, pd, distance=substring_distance)
    # Phase 5: subsequence
    _score_subsequence(qbytes, norm, query, ed, state)
    # Phase 6: acronym
    _score_acronym(qbytes, norm, query, ed.acronym_weight, state)

    if state.best_score >= query.config.min_score:
        return (state.best_score, state.best_kind)
    return None


_ASCII_LOWER_LOCAL = bytes(
    b | 0x20 if 0x41 <= b <= 0x5A else b for b in range(256)
)


def _score_prefix(qbytes, norm, query, ed, state, distance=_UNSET) -> int | None:
    qlen, clen = len(qbytes), len(norm)
    if distance is _UNSET:
        distance = prefix_edit_distance(qbytes, norm, state.effective_max_ed)
    if distance is None:
        return None
    if qlen <= 3 and distance > 0 and clen != qlen:
        return None
    score = normalized_score(distance, qlen, "prefix", ed.prefix_weight, ed.substring_weight)
    if clen == qlen and distance > 0:
        score += (1.0 - score) * 0.7
    if state.needs_alignment:
        positions, bonus = _alignment_if_needed(qbytes, norm, state, ed)
        if positions:
            if distance > 0:
                max_bonus = (1.0 - score) * 0.8
                score += min(bonus, max_bonus)
            else:
                score = min(score + bonus, 1.0)
    if clen > qlen:
        length_penalty = (clen - qlen) * ed.length_penalty
        score -= length_penalty
        if distance == 0:
            score += min(length_penalty * 0.9, 0.15)
    score = min(score, 1.0)
    if score >= query.config.min_score:
        state.best_score = score
        state.best_kind = "prefix"
    return distance


def _score_substring(
    qbytes, norm, query, ed, state, prefix_distance, distance=_UNSET
) -> None:
    qlen, clen = len(qbytes), len(norm)
    if state.best_score >= 0.7 or prefix_distance == 0:
        return
    if distance is _UNSET:
        distance = substring_edit_distance(qbytes, norm, state.effective_max_ed)
    if distance is None:
        return
    if qlen <= 3 and distance > 0 and clen != qlen:
        return
    score = normalized_score(distance, qlen, "substring", ed.prefix_weight, ed.substring_weight)
    if state.needs_alignment:
        if state.cached_positions is None:
            if qlen <= 4:
                positions = find_match_positions(qbytes, norm, state.boundary)
                if distance == 0 and len(positions) == qlen:
                    first, last = positions[0], positions[-1]
                    if last - first + 1 != qlen:
                        start = find_contiguous_substring(qbytes, norm, state.boundary)
                        if start >= 0:
                            positions = list(range(start, start + qlen))
                state.cached_positions = positions
                state.cached_bonus = (
                    calculate_bonuses(positions, norm, state.boundary, ed)
                    if positions
                    else 0.0
                )
            else:
                positions, bonus = optimal_alignment(qbytes, norm, state.boundary, ed)
                state.cached_positions = positions
                state.cached_bonus = bonus
        if state.cached_positions:
            if distance > 0:
                max_bonus = (1.0 - score) * 0.8
                score += min(state.cached_bonus, max_bonus)
            else:
                score = min(score + state.cached_bonus, 1.0)
    if clen > qlen:
        length_penalty = (clen - qlen) * ed.length_penalty
        score -= length_penalty
        if (
            distance == 0
            and state.cached_positions is not None
            and len(state.cached_positions) == qlen
        ):
            first, last = state.cached_positions[0], state.cached_positions[-1]
            if last - first + 1 == qlen:
                start_bound = bool(state.boundary[first])
                next_pos = last + 1
                if next_pos >= clen:
                    end_bound = True
                else:
                    b = norm[next_pos]
                    end_bound = not (
                        0x30 <= b <= 0x39 or 0x41 <= b <= 0x5A or 0x61 <= b <= 0x7A
                    )
                if start_bound and end_bound:
                    score += min(length_penalty * 0.8, 0.15)
    score = min(score, 1.0)
    if score > state.best_score and score >= query.config.min_score:
        state.best_score = score
        state.best_kind = "substring"


def _score_subsequence(qbytes, norm, query, ed, state) -> None:
    qlen, clen = len(qbytes), len(norm)
    if state.best_score >= query.config.min_score:
        return
    if state.cached_positions is None:
        # quick O(n+m) subsequence check
        qi = 0
        for ci in range(clen):
            if norm[ci] == qbytes[qi]:
                qi += 1
                if qi == qlen:
                    break
        if qi < qlen:
            return
    positions, bonus = _alignment_if_needed(qbytes, norm, state, ed)
    if len(positions) != qlen:
        return
    total_gaps = positions[0]
    for i in range(1, qlen):
        total_gaps += positions[i] - positions[i - 1] - 1
    gap_ratio = total_gaps / clen
    score = max(0.3, 1.0 - gap_ratio)
    score *= ed.substring_weight
    max_bonus = (1.0 - score) * 0.8
    score += min(bonus, max_bonus)
    if clen > qlen:
        score -= (clen - qlen) * ed.length_penalty
    if score > state.best_score and score >= query.config.min_score:
        state.best_score = score
        state.best_kind = "substring"


def _score_acronym(qbytes, norm, query, acronym_weight, state) -> None:
    qlen = len(qbytes)
    clen = len(norm)
    if qlen < 2 or qlen > 8:
        return
    boundary = state.boundary
    word_count = int(boundary.sum())
    if word_count < 3 or word_count < qlen:
        return
    initials = bytes(norm[i] for i in range(clen) if boundary[i])
    qi = 0
    for ch in initials:
        if qi < qlen and qbytes[qi] == ch:
            qi += 1
    if qi != qlen:
        return
    coverage = qlen / len(initials)
    score = (0.55 + 0.4 * coverage) * acronym_weight
    if score > state.best_score and score >= query.config.min_score:
        state.best_score = score
        state.best_kind = "acronym"


def _score_tiny_query1(raw: bytes, q0: int, ed: EditDistanceConfig, min_score: float):
    """qLen==1 fast path (`FuzzyMatcher.swift:957-1088`)."""
    from fuzzymatch_spark.kernels.normalize import (
        _LATIN1_TO_ASCII,
        _lowercase_latin_extended,
    )

    clen = len(raw)
    if clen == 1:
        c = raw[0]
        if (c | 0x20 if 0x41 <= c <= 0x5A else c) == q0:
            return (1.0, "exact")
        return None
    if clen == 2 and raw[0] == 0xC3:
        if _LATIN1_TO_ASCII[_lowercase_latin_extended(raw[1])] == q0:
            return (1.0, "exact")

    best_pos = -1
    best_is_boundary = False
    i = 0
    while i < clen:
        b = raw[i]
        if b == 0xC3 and i + 1 < clen:
            if _LATIN1_TO_ASCII[_lowercase_latin_extended(raw[i + 1])] == q0:
                if i == 0:
                    return _tiny_prefix_score(clen, ed, min_score)
                is_bound = _tiny_boundary(raw, i)
                if best_pos == -1 or (not best_is_boundary and is_bound):
                    best_pos = i
                    best_is_boundary = is_bound
                    if is_bound:
                        break
            i += 2
            continue
        if b in (0xCE, 0xCF, 0xD0, 0xD1):
            i += 2
            continue
        lower = b | 0x20 if 0x41 <= b <= 0x5A else b
        if lower == q0:
            if i == 0:
                return _tiny_prefix_score(clen, ed, min_score)
            is_bound = _tiny_boundary(raw, i)
            if best_pos == -1 or (not best_is_boundary and is_bound):
                best_pos = i
                best_is_boundary = is_bound
                if is_bound:
                    break
        i += 1

    if best_pos == -1:
        return None
    score = 1.0
    bonus = 0.0
    if best_is_boundary:
        bonus += ed.word_boundary_bonus
    if ed.first_match_bonus > 0 and best_pos < ed.first_match_bonus_range:
        decay = 1.0 - best_pos / ed.first_match_bonus_range
        bonus += ed.first_match_bonus * decay
    score = min(score + bonus, 1.0)
    if clen > 1:
        length_penalty = (clen - 1) * ed.length_penalty
        score -= length_penalty
        if best_is_boundary:
            next_pos = best_pos + 1
            if next_pos >= clen:
                end_bound = True
            else:
                nb = raw[next_pos]
                end_bound = not (
                    0x30 <= nb <= 0x39 or 0x41 <= nb <= 0x5A or 0x61 <= nb <= 0x7A
                )
            if end_bound:
                score += min(length_penalty * 0.8, 0.15)
    score = min(score, 1.0)
    if score >= min_score:
        return (score, "substring")
    return None


def _tiny_prefix_score(clen: int, ed: EditDistanceConfig, min_score: float):
    score = 1.0
    score = min(score + ed.word_boundary_bonus + ed.first_match_bonus, 1.0)
    length_penalty = (clen - 1) * ed.length_penalty
    score -= length_penalty
    score += min(length_penalty * 0.9, 0.15)
    score = min(score, 1.0)
    if score >= min_score:
        return (score, "prefix")
    return None


def _tiny_boundary(raw: bytes, i: int) -> bool:
    """isWordBoundaryInline (`FuzzyMatcher.swift:1092-1115`)."""
    if i == 0:
        return True
    prev = raw[i - 1]
    curr = raw[i]
    if prev == 0x5F:
        return True
    if 0x30 <= prev <= 0x39:
        return True
    if 0x61 <= prev <= 0x7A and 0x41 <= curr <= 0x5A:
        return True
    prev_is_alnum = (
        0x30 <= prev <= 0x39
        or 0x41 <= prev <= 0x5A
        or 0x61 <= prev <= 0x7A
        or prev in (0xC3, 0xCE, 0xCF, 0xD0, 0xD1)
        or 0x80 <= prev <= 0xBF
    )
    return not prev_is_alnum


def default_sw_config() -> SmithWatermanConfig:
    return SmithWatermanConfig()
