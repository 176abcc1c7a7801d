"""Byte-level normalization: case folding + combining-mark stripping.

Reproduces the reference normalization semantics
(`Sources/FuzzyMatch/Prefilters.swift:196-248`): ASCII lowercase, Latin-1
Supplement fold to ASCII base letters (`Prefilters.swift:97-110`), Greek
(`:141-153`) and Cyrillic (`:167-183`) case folds, and stripping of combining
diacritical marks U+0300-U+036F (`:80-83`).  Output is a *byte* string; the
matching pipeline operates on normalized UTF-8 bytes throughout, exactly like
the reference.

The ASCII fast path is a single C-level ``bytes.translate``; the multi-byte
path is a Python scan (rare for web captions, and still O(n)).
"""

from __future__ import annotations

import numpy as np

# --- ASCII lowercase translate table (A-Z -> a-z, rest identity) ---
_ASCII_LOWER = bytes(b | 0x20 if 0x41 <= b <= 0x5A else b for b in range(256))

# --- Latin-1 second-byte fold table (input: lowercased second byte of a 0xC3
#     sequence, output: ASCII base letter or 0) — `Prefilters.swift:97-110` ---
_LATIN1_TO_ASCII = np.zeros(256, dtype=np.uint8)
for _b in range(0xA0, 0xA6):
    _LATIN1_TO_ASCII[_b] = 0x61  # a
_LATIN1_TO_ASCII[0xA7] = 0x63  # c
for _b in range(0xA8, 0xAC):
    _LATIN1_TO_ASCII[_b] = 0x65  # e
for _b in range(0xAC, 0xB0):
    _LATIN1_TO_ASCII[_b] = 0x69  # i
_LATIN1_TO_ASCII[0xB1] = 0x6E  # n
for _b in range(0xB2, 0xB7):
    _LATIN1_TO_ASCII[_b] = 0x6F  # o
for _b in range(0xB9, 0xBD):
    _LATIN1_TO_ASCII[_b] = 0x75  # u
_LATIN1_TO_ASCII[0xBD] = 0x79  # y
_LATIN1_TO_ASCII[0xBF] = 0x79  # y


def _lowercase_latin_extended(second: int) -> int:
    # 0x80-0x9E except 0x97 (U+00D7 multiplication sign) -> +0x20
    if 0x80 <= second <= 0x9E and second != 0x97:
        return second + 0x20
    return second


def _lowercase_greek(lead: int, second: int) -> tuple[int, int]:
    if lead == 0xCE:
        if 0x91 <= second <= 0x9F:
            return 0xCE, second + 0x20
        if 0xA0 <= second <= 0xA9 and second != 0xA2:
            return 0xCF, second - 0x20
    return lead, second


def _lowercase_cyrillic(lead: int, second: int) -> tuple[int, int]:
    if lead == 0xD0:
        if 0x90 <= second <= 0x9F:
            return 0xD0, second + 0x20
        if 0xA0 <= second <= 0xAF:
            return 0xD1, second - 0x20
        if 0x80 <= second <= 0x8F:
            return 0xD1, second + 0x10
    return lead, second


def _is_combining_mark(lead: int, second: int) -> bool:
    return (lead == 0xCC and 0x80 <= second <= 0xBF) or (
        lead == 0xCD and 0x80 <= second <= 0xAF
    )


def normalize_bytes(raw: bytes) -> bytes:
    """Lowercase + fold + strip combining marks. Mirrors ``lowercaseUTF8``."""
    # ASCII fast path: translate is C-speed and covers the common case.
    if raw.isascii():
        return raw.translate(_ASCII_LOWER)

    out = bytearray()
    i = 0
    n = len(raw)
    while i < n:
        b = raw[i]
        nxt = raw[i + 1] if i + 1 < n else -1
        if nxt >= 0 and _is_combining_mark(b, nxt):
            i += 2
        elif b == 0xC3 and nxt >= 0:
            lowered = _lowercase_latin_extended(nxt)
            ascii_base = int(_LATIN1_TO_ASCII[lowered])
            if ascii_base:
                out.append(ascii_base)
            else:
                out.append(b)
                out.append(lowered)
            i += 2
        elif b in (0xCE, 0xCF) and nxt >= 0:
            lead, second = _lowercase_greek(b, nxt)
            out.append(lead)
            out.append(second)
            i += 2
        elif b in (0xD0, 0xD1) and nxt >= 0:
            lead, second = _lowercase_cyrillic(b, nxt)
            out.append(lead)
            out.append(second)
            i += 2
        else:
            out.append(b | 0x20 if 0x41 <= b <= 0x5A else b)
            i += 1
    return bytes(out)


def normalize_text(s: str) -> str:
    """Normalize a str; result decoded with surrogate-safe fallback."""
    return normalize_bytes(s.encode("utf-8")).decode("utf-8", errors="replace")


# --- char bitmask (`Prefilters.swift:380-392`): 37-bit presence bloom +
#     bits 37-63 for hashed 2-byte chars (`Prefilters.swift:260-262`) ---
_BITMASK_LOOKUP = np.zeros(256, dtype=np.uint64)
for _b in range(0x61, 0x7B):
    _BITMASK_LOOKUP[_b] = np.uint64(1) << np.uint64(_b - 0x61)
for _b in range(0x41, 0x5B):
    _BITMASK_LOOKUP[_b] = np.uint64(1) << np.uint64(_b - 0x41)
for _b in range(0x30, 0x3A):
    _BITMASK_LOOKUP[_b] = np.uint64(1) << np.uint64(_b - 0x30 + 26)
_BITMASK_LOOKUP[0x5F] = np.uint64(1) << np.uint64(36)

_MULTIBYTE_LEADS = frozenset((0xC3, 0xCE, 0xCF, 0xD0, 0xD1))


def char_bitmask(norm: bytes) -> int:
    """Bitmask over *normalized* bytes. Bits 0-25 a-z, 26-35 digits,
    36 underscore, 37-63 hashed 2-byte chars (``37 + (second^lead) % 27``)."""
    if norm.isascii():
        if not norm:
            return 0
        arr = np.frombuffer(norm, dtype=np.uint8)
        return int(np.bitwise_or.reduce(_BITMASK_LOOKUP[arr]))
    mask = 0
    i = 0
    n = len(norm)
    while i < n:
        b = norm[i]
        if b in _MULTIBYTE_LEADS and i + 1 < n:
            bit = 37 + ((norm[i + 1] ^ b) % 27)
            mask |= 1 << bit
            i += 2
        else:
            mask |= int(_BITMASK_LOOKUP[b])
            i += 1
    return mask


def popcount(x: int) -> int:
    return bin(x & 0xFFFFFFFFFFFFFFFF).count("1")
