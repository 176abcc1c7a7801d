"""Match-position finding and bonus calculation.

Mirrors `Sources/FuzzyMatch/ScoringBonuses.swift`:

* ``find_match_positions`` — greedy position finder (`:70-149`): boundary in
  a look-ahead window of ``queryLen + 5``, else consecutive, else first; full
  scan fallback.
* ``optimal_alignment`` — two-state affine-gap DP maximizing bonuses with
  traceback (`:168-374`); candidates > 512 bytes fall back to greedy.
* ``calculate_bonuses`` — boundary/consecutive/gap/first-match bonus
  arithmetic (`:414-472`).
* ``find_contiguous_substring`` — whole-word-preferring contiguous scan
  (`:489-527`).
"""

from __future__ import annotations

import numpy as np

from fuzzymatch_spark.config import EditDistanceConfig


def find_match_positions(
    query: bytes, candidate: bytes, boundary: np.ndarray
) -> list[int]:
    """Greedy in-order positions of query chars in candidate; [] on failure."""
    qlen, clen = len(query), len(candidate)
    if qlen == 0 or clen == 0:
        return []
    positions: list[int] = []
    cand_idx = 0
    for qi in range(qlen):
        qc = query[qi]
        best = -1
        found_boundary = False
        search_limit = min(cand_idx + qlen + 5, clen)
        for pos in range(cand_idx, search_limit):
            if candidate[pos] == qc:
                if boundary[pos]:
                    best = pos
                    found_boundary = True
                    break
                if best == -1:
                    best = pos
        if not found_boundary and best != -1 and positions:
            prev = positions[-1]
            if best != prev + 1 and prev + 1 < clen and candidate[prev + 1] == qc:
                best = prev + 1
        if best == -1:
            for pos in range(search_limit, clen):
                if candidate[pos] == qc:
                    best = pos
                    break
        if best == -1:
            return []
        positions.append(best)
        cand_idx = best + 1
    return positions


def calculate_bonuses(
    positions: list[int],
    candidate: bytes,
    boundary: np.ndarray,
    config: EditDistanceConfig,
) -> float:
    if not positions:
        return 0.0
    bonus = 0.0
    prev = -2
    gp = config.gap_penalty
    for i, pos in enumerate(positions):
        if boundary[pos]:
            bonus += config.word_boundary_bonus
        if pos == prev + 1:
            bonus += config.consecutive_bonus
        elif i > 0 and pos > prev + 1:
            gap = pos - prev - 1
            if gp.kind == "linear":
                bonus -= gap * gp.per_char
            elif gp.kind == "affine":
                bonus -= gp.open + (gap - 1) * gp.extend
        prev = pos
    if config.first_match_bonus > 0:
        first = positions[0]
        if first < config.first_match_bonus_range:
            decay = 1.0 - first / config.first_match_bonus_range
            bonus += config.first_match_bonus * decay
    return bonus


def find_contiguous_substring(
    query: bytes, candidate: bytes, boundary: np.ndarray
) -> int:
    qlen, clen = len(query), len(candidate)
    if qlen == 0 or qlen > clen:
        return -1
    first = -1
    start = candidate.find(query)
    while start != -1:
        if first < 0:
            first = start
        start_bound = bool(boundary[start]) if start < len(boundary) else False
        if start == 0:
            start_bound = True
        end_pos = start + qlen
        if end_pos >= clen:
            end_bound = True
        else:
            b = candidate[end_pos]
            end_bound = not (
                0x30 <= b <= 0x39 or 0x41 <= b <= 0x5A or 0x61 <= b <= 0x7A
            )
        if start_bound and end_bound:
            return start
        start = candidate.find(query, start + 1)
    return first


def optimal_alignment(
    query: bytes,
    candidate: bytes,
    boundary: np.ndarray,
    config: EditDistanceConfig,
) -> tuple[list[int], float]:
    """Two-state affine-gap alignment DP; returns (positions, bonus)."""
    qlen, clen = len(query), len(candidate)
    if qlen == 0 or clen == 0:
        return [], 0.0
    if clen > 512:
        positions = find_match_positions(query, candidate, boundary)
        if not positions:
            return [], 0.0
        return positions, calculate_bonuses(positions, candidate, boundary, config)

    gp = config.gap_penalty
    if gp.kind == "none":
        gap_open = gap_extend = 0.0
    elif gp.kind == "linear":
        gap_open = gap_extend = gp.per_char
    else:
        gap_open, gap_extend = gp.open, gp.extend

    neg = -np.inf
    match_m = np.full((clen, qlen), neg)
    gap_m = np.full((clen, qlen), neg)
    trace = np.zeros((clen, qlen), dtype=np.uint8)  # 0 none, 1 consecutive, 2 gap

    qarr = np.frombuffer(query, dtype=np.uint8)
    carr = np.frombuffer(candidate, dtype=np.uint8)
    best_end = neg
    best_i = -1
    best_from_match = False

    for i in range(clen):
        b_bonus = config.word_boundary_bonus if boundary[i] else 0.0
        if i > 0:
            pm = match_m[i - 1]
            pg = gap_m[i - 1]
            gap_m[i] = np.maximum(
                np.where(np.isfinite(pm), pm - gap_open, neg),
                np.where(np.isfinite(pg), pg - gap_extend, neg),
            )
        eq = carr[i] == qarr
        for j in np.nonzero(eq)[0]:
            if j == 0:
                match_m[i, 0] = b_bonus
                trace[i, 0] = 2
            elif i > 0:
                new_match = neg
                flag = 0
                pm = match_m[i - 1, j - 1]
                if np.isfinite(pm):
                    v = pm + config.consecutive_bonus + b_bonus
                    if v > new_match:
                        new_match, flag = v, 1
                pg = gap_m[i - 1, j - 1]
                if np.isfinite(pg):
                    v = pg + b_bonus
                    if v > new_match:
                        new_match, flag = v, 2
                if flag:
                    match_m[i, j] = new_match
                    trace[i, j] = flag
            if j == qlen - 1 and match_m[i, j] > best_end:
                best_end = match_m[i, j]
                best_i = i
                best_from_match = True
        if gap_m[i, qlen - 1] > best_end:
            best_end = gap_m[i, qlen - 1]
            best_i = i
            best_from_match = False

    if not np.isfinite(best_end):
        return [], 0.0

    positions = [0] * qlen
    j = qlen - 1
    i = best_i
    if not best_from_match:
        while i >= 0:
            if np.isfinite(match_m[i, j]) and trace[i, j] != 0:
                break
            i -= 1
        if i < 0:
            return [], 0.0
    positions[j] = i
    while j > 0:
        t = trace[i, j]
        if t == 1:
            i -= 1
            j -= 1
        else:
            i -= 1
            j -= 1
            while i >= 0:
                if np.isfinite(match_m[i, j]) and trace[i, j] != 0:
                    break
                i -= 1
            if i < 0:
                return [], 0.0
        positions[j] = i

    bonus = float(best_end)
    if config.first_match_bonus > 0:
        first = positions[0]
        if first < config.first_match_bonus_range:
            decay = 1.0 - first / config.first_match_bonus_range
            bonus += config.first_match_bonus * decay
    return positions, bonus
