"""Word-boundary detection.

Mirrors `Sources/FuzzyMatch/WordBoundary.swift:70-294`: a position is a
boundary at index 0, after '_', after a digit, on a lower->upper camelCase
transition, or after a non-alphanumeric byte (multi-byte lead/continuation
bytes count as alphanumeric).

The reference packs boundaries for the first 64 bytes into a UInt64 computed
from the *original* bytes at compressed (post-normalization) positions
(`WordBoundary.swift:237-294`), and falls back to boundary checks on the
*normalized* bytes for positions >= 64 (camelCase information is lost there —
an acknowledged reference limitation, `FuzzyMatcher.swift:872-876`).  We
reproduce exactly that split so scores agree, but return a full-length bool
array instead of a capped bitmask.
"""

from __future__ import annotations

import numpy as np

from fuzzymatch_spark.kernels.normalize import (
    _LATIN1_TO_ASCII,
    _is_combining_mark,
    _lowercase_latin_extended,
    _MULTIBYTE_LEADS,
)


def _is_word_boundary_from_prev(prev: int, curr: int) -> bool:
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
        or prev in _MULTIBYTE_LEADS
        or 0x80 <= prev <= 0xBF
    )
    return not prev_is_alnum


def is_word_boundary(index: int, norm: bytes) -> bool:
    """Boundary check on normalized bytes (used for positions >= 64)."""
    if index == 0:
        return True
    if index >= len(norm):
        return False
    return _is_word_boundary_from_prev(norm[index - 1], norm[index])


def _boundary_ascii_vec(raw: np.ndarray) -> np.ndarray:
    """Vectorized boundary array for pure-ASCII original bytes."""
    n = len(raw)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    out[0] = True
    if n == 1:
        return out
    prev = raw[:-1]
    curr = raw[1:]
    after_underscore = prev == 0x5F
    after_digit = (prev >= 0x30) & (prev <= 0x39)
    camel = ((prev >= 0x61) & (prev <= 0x7A)) & ((curr >= 0x41) & (curr <= 0x5A))
    prev_alnum = (
        ((prev >= 0x30) & (prev <= 0x39))
        | ((prev >= 0x41) & (prev <= 0x5A))
        | ((prev >= 0x61) & (prev <= 0x7A))
    )
    out[1:] = after_underscore | after_digit | camel | ~prev_alnum
    return out


def boundary_array(original: bytes, norm: bytes) -> np.ndarray:
    """Full-length boundary flags aligned with *normalized* byte positions.

    Positions < 64 reproduce ``computeBoundaryMaskCompressed`` (original
    bytes, compressed indices); positions >= 64 use the normalized bytes
    (reference fallback path).
    """
    if original.isascii():
        # positions are 1:1 and norm == lower(original)
        raw = np.frombuffer(original, dtype=np.uint8)
        out = _boundary_ascii_vec(raw)
        if len(out) > 64:
            # beyond 64 the reference re-derives from the lowercased bytes:
            # camelCase transitions disappear after lowercasing
            nb = np.frombuffer(norm, dtype=np.uint8)
            tail = _boundary_ascii_vec(nb)
            out[64:] = tail[64:]
        return out

    out = np.zeros(len(norm), dtype=bool)
    in_idx = 0
    out_idx = 0
    n = len(original)
    prev_meaningful = 0
    while in_idx < n and out_idx < min(64, len(norm)):
        b = original[in_idx]
        nxt = original[in_idx + 1] if in_idx + 1 < n else -1
        if nxt >= 0 and _is_combining_mark(b, nxt):
            in_idx += 2
            continue
        if out_idx == 0:
            is_b = True
        else:
            is_b = _is_word_boundary_from_prev(prev_meaningful, b)
        out[out_idx] = is_b
        if b in _MULTIBYTE_LEADS and nxt >= 0:
            prev_meaningful = nxt
            in_idx += 2
            if b == 0xC3 and _LATIN1_TO_ASCII[_lowercase_latin_extended(nxt)] != 0:
                out_idx += 1
            else:
                out_idx += 2
        else:
            prev_meaningful = b
            in_idx += 1
            out_idx += 1
    for i in range(64, len(norm)):
        out[i] = is_word_boundary(i, norm)
    return out
