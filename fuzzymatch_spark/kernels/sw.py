"""Smith-Waterman (nucleo-style) scoring kernel.

DP semantics follow `Sources/FuzzyMatch/SmithWaterman.swift:49-177`: three
states (match / gap / carried-consecutive-bonus), zero-floor convention,
boundary bonus carried through consecutive runs.  The inner loop over query
positions has only diagonal dependencies on the *previous* candidate row, so
it vectorizes fully in numpy: one python-level loop over candidate bytes.

The per-position bonus tiers reproduce the fused lowercase+bonus pass of
`Sources/FuzzyMatch/FuzzyMatcher+SmithWaterman.swift:68-270`
(whitespace 10 / delimiter 9 / boundary 8 / camelCase & digit 5 / else 0),
and the orchestration (bitmask prefilter tolerance 0, exact early exit,
multi-atom AND semantics, ``raw/maxScore`` normalization, acronym fallback)
follows `FuzzyMatcher+SmithWaterman.swift:29-383`.
"""

from __future__ import annotations

import numpy as np

from fuzzymatch_spark.config import SmithWatermanConfig
from fuzzymatch_spark.kernels.normalize import (
    _LATIN1_TO_ASCII,
    _is_combining_mark,
    _lowercase_cyrillic,
    _lowercase_greek,
    _lowercase_latin_extended,
    char_bitmask,
    normalize_bytes,
    popcount,
)

_DELIMS = (0x2F, 0x3A, 0x3B, 0x7C)  # / : ; |


def sw_bonus_array(raw: bytes, sw: SmithWatermanConfig) -> tuple[bytes, np.ndarray]:
    """Fused normalize + tiered per-position bonus. Returns (norm, bonus)."""
    bb = sw.bonus_boundary
    bw = sw.bonus_boundary_whitespace
    bd = sw.bonus_boundary_delimiter
    bc = sw.bonus_camel_case

    if raw.isascii():
        arr = np.frombuffer(raw, dtype=np.uint8)
        n = len(arr)
        norm = normalize_bytes(raw)
        bonus = np.zeros(n, dtype=np.int32)
        if n == 0:
            return norm, bonus
        is_upper = (arr >= 0x41) & (arr <= 0x5A)
        is_lower = (arr >= 0x61) & (arr <= 0x7A)
        is_digit = (arr >= 0x30) & (arr <= 0x39)
        is_ws = (arr == 0x20) | (arr == 0x09)
        is_word = is_upper | is_lower | is_digit
        prev = np.empty(n, dtype=np.uint8)
        prev[0] = 0
        prev[1:] = arr[:-1]
        p_upper = (prev >= 0x41) & (prev <= 0x5A)
        p_lower = (prev >= 0x61) & (prev <= 0x7A)
        p_digit = (prev >= 0x30) & (prev <= 0x39)
        p_ws = (prev == 0x20) | (prev == 0x09)
        p_delim = np.isin(prev, np.array(_DELIMS, dtype=np.uint8))
        p_alnum = p_upper | p_lower | p_digit

        bonus[:] = np.select(
            [
                is_ws,
                ~is_word,
                p_ws,
                p_delim,
                p_lower & is_upper,
                (~p_digit) & is_digit,
                (~p_alnum) & (~p_ws),
            ],
            [bw, bb, bw, bd, bc, bc, bb],
            default=0,
        )
        bonus[0] = bw
        return norm, bonus

    # multi-byte slow path (`FuzzyMatcher+SmithWaterman.swift:129-270`)
    out = bytearray()
    bonus_list: list[int] = []
    prev_byte = 0
    i = 0
    n = len(raw)

    def _tier(prev: int) -> int:
        if prev in (0x20, 0x09):
            return bw
        if prev in _DELIMS:
            return bd
        prev_is_alnum = (
            0x41 <= prev <= 0x5A
            or 0x61 <= prev <= 0x7A
            or 0x30 <= prev <= 0x39
            or prev in (0xC3, 0xCE, 0xCF, 0xD0, 0xD1)
            or 0x80 <= prev <= 0xBF
        )
        return 0 if prev_is_alnum else bb

    while i < n:
        b = raw[i]
        nxt = raw[i + 1] if i + 1 < n else -1
        if nxt >= 0 and _is_combining_mark(b, nxt):
            i += 2
            continue
        if b == 0xC3 and nxt >= 0:
            lowered = _lowercase_latin_extended(nxt)
            ascii_base = int(_LATIN1_TO_ASCII[lowered])
            pos_bonus = bw if not out else _tier(prev_byte)
            if ascii_base:
                out.append(ascii_base)
                bonus_list.append(pos_bonus)
            else:
                out.append(b)
                out.append(lowered)
                bonus_list.extend((pos_bonus, 0))
            prev_byte = nxt
            i += 2
        elif b in (0xCE, 0xCF) and nxt >= 0:
            lead, second = _lowercase_greek(b, nxt)
            pos_bonus = bw if not out else _tier(prev_byte)
            out.append(lead)
            out.append(second)
            bonus_list.extend((pos_bonus, 0))
            prev_byte = nxt
            i += 2
        elif b in (0xD0, 0xD1) and nxt >= 0:
            lead, second = _lowercase_cyrillic(b, nxt)
            pos_bonus = bw if not out else _tier(prev_byte)
            out.append(lead)
            out.append(second)
            bonus_list.extend((pos_bonus, 0))
            prev_byte = nxt
            i += 2
        else:
            if not out:
                pos_bonus = bw
            else:
                curr_is_upper = 0x41 <= b <= 0x5A
                curr_is_lower = 0x61 <= b <= 0x7A
                curr_is_digit = 0x30 <= b <= 0x39
                curr_is_ws = b in (0x20, 0x09)
                if curr_is_ws:
                    pos_bonus = bw
                elif not (curr_is_upper or curr_is_lower or curr_is_digit):
                    pos_bonus = bb
                else:
                    p = prev_byte
                    if p in (0x20, 0x09):
                        pos_bonus = bw
                    elif p in _DELIMS:
                        pos_bonus = bd
                    elif 0x61 <= p <= 0x7A and curr_is_upper:
                        pos_bonus = bc
                    elif not (0x30 <= p <= 0x39) and curr_is_digit:
                        pos_bonus = bc
                    else:
                        p_alnum = (
                            0x41 <= p <= 0x5A
                            or 0x61 <= p <= 0x7A
                            or 0x30 <= p <= 0x39
                            or p in (0xC3, 0xCE, 0xCF, 0xD0, 0xD1)
                            or 0x80 <= p <= 0xBF
                        )
                        p_ws = p in (0x20, 0x09)
                        pos_bonus = 0 if (p_alnum or p_ws) else bb
            out.append(b | 0x20 if 0x41 <= b <= 0x5A else b)
            bonus_list.append(pos_bonus)
            prev_byte = b
            i += 1
    return bytes(out), np.array(bonus_list, dtype=np.int32)


def smith_waterman_score(
    query: bytes, candidate: bytes, bonus: np.ndarray, sw: SmithWatermanConfig
) -> int:
    """Raw Int32 SW score; 0 means no valid alignment."""
    qlen = len(query)
    clen = len(candidate)
    if qlen == 0 or clen == 0:
        return 0
    Q = np.frombuffer(query, dtype=np.uint8).astype(np.int32)
    C = np.frombuffer(candidate, dtype=np.uint8)

    score_match = sw.score_match
    gap_start = sw.penalty_gap_start
    gap_extend = sw.penalty_gap_extend
    bonus_cons = sw.bonus_consecutive
    bonus_bound = sw.bonus_boundary
    first_mult = sw.bonus_first_char_multiplier

    M = np.zeros(qlen, dtype=np.int64)
    G = np.zeros(qlen, dtype=np.int64)
    B = np.zeros(qlen, dtype=np.int64)
    best = 0

    for i in range(clen):
        cand_char = int(C[i])
        pos_bonus = int(bonus[i])

        # gap transition from previous row
        new_G = np.maximum(np.maximum(M - gap_start, G - gap_extend), 0)

        eq = Q == cand_char
        # diagonal values: previous row shifted right by one
        diag_M = np.empty(qlen, dtype=np.int64)
        diag_G = np.empty(qlen, dtype=np.int64)
        diag_B = np.empty(qlen, dtype=np.int64)
        diag_M[0] = 0
        diag_G[0] = 0
        diag_B[0] = 0
        diag_M[1:] = M[:-1]
        diag_G[1:] = G[:-1]
        diag_B[1:] = B[:-1]

        carried = np.maximum(diag_B, bonus_cons)
        if pos_bonus >= bonus_bound:
            carried = np.maximum(carried, pos_bonus)
        effective = np.maximum(carried, pos_bonus)
        from_cons = np.where(diag_M > 0, diag_M + score_match + effective, 0)
        from_gap = np.where(diag_G > 0, diag_G + score_match + pos_bonus, 0)

        new_M = np.zeros(qlen, dtype=np.int64)
        new_B = np.zeros(qlen, dtype=np.int64)
        # j > 0: consecutive wins ties (strict > for gap path)
        cons_w = from_cons > 0
        new_M = np.where(cons_w, from_cons, new_M)
        new_B = np.where(cons_w, carried, new_B)
        gap_w = from_gap > new_M
        new_M = np.where(gap_w, from_gap, new_M)
        new_B = np.where(gap_w, pos_bonus, new_B)
        # j == 0: first query char
        new_M[0] = score_match + pos_bonus * first_mult
        new_B[0] = pos_bonus
        # zero out non-matching columns
        new_M = np.where(eq, new_M, 0)
        new_B = np.where(eq, new_B, 0)

        M, G, B = new_M, new_G, new_B
        last = max(int(M[qlen - 1]), int(G[qlen - 1]))
        if last > best:
            best = last

    return best


def score_smith_waterman(raw: bytes, query) -> tuple[float, str] | None:
    """Full SW orchestration (`FuzzyMatcher+SmithWaterman.swift:29-383`)."""
    from fuzzymatch_spark.kernels.scoring import _score_acronym, _State
    from fuzzymatch_spark.kernels.boundary import boundary_array

    sw = query.config.smith_waterman
    min_score = query.config.min_score
    qbytes = query.lowered
    qlen = len(qbytes)
    if qlen == 0:
        return (1.0, "exact")
    if len(raw) == 0:
        return None

    cand_mask = char_bitmask(normalize_bytes(raw))
    if popcount(query.bitmask & ~cand_mask) > 0:
        return None

    norm, bonus = sw_bonus_array(raw, sw)

    if norm == qbytes:
        return (1.0, "exact")

    if len(query.atoms) > 1:
        total = 0
        for atom in query.atoms:
            s = smith_waterman_score(atom, norm, bonus, sw)
            if s <= 0:
                return None
            total += s
        if query.max_sw_score <= 0:
            return None
        ns = min(1.0, max(0.0, total / query.max_sw_score))
        if ns >= min_score:
            return (ns, "alignment")
        return None

    raw_score = smith_waterman_score(qbytes, norm, bonus, sw)
    best_score = -1.0
    best_kind = "alignment"
    if raw_score > 0 and query.max_sw_score > 0:
        ns = min(1.0, max(0.0, raw_score / query.max_sw_score))
        if ns >= min_score:
            best_score = ns

    if 2 <= qlen <= 8:
        state = _State()
        state.boundary = boundary_array(raw, norm)
        state.best_score = best_score
        state.best_kind = best_kind
        _score_acronym(qbytes, norm, query, 1.0, state)
        if state.best_score > best_score:
            best_score = state.best_score
            best_kind = state.best_kind

    if best_score >= min_score:
        return (best_score, best_kind)
    return None
