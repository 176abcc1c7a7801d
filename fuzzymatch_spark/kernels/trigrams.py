"""Character trigram shingles.

Same 3-byte packing as the reference (`Sources/FuzzyMatch/Trigrams.swift:52-54`):
``hash = a | b<<8 | c<<16`` so fixtures transfer directly.  Space-containing
trigrams are excluded (`Trigrams.swift:81-86`) so multi-word strings compare
across separator conventions.
"""

from __future__ import annotations

import numpy as np


def trigram_array(norm: bytes) -> np.ndarray:
    """All (non-distinct) packed non-space trigrams, vectorized."""
    if len(norm) < 3:
        return np.empty(0, dtype=np.uint32)
    arr = np.frombuffer(norm, dtype=np.uint8).astype(np.uint32)
    a, b, c = arr[:-2], arr[1:-1], arr[2:]
    packed = a | (b << np.uint32(8)) | (c << np.uint32(16))
    keep = (a != 0x20) & (b != 0x20) & (c != 0x20)
    return packed[keep]


def trigram_set(norm: bytes) -> np.ndarray:
    """Distinct packed trigrams, sorted (the reference's Set<UInt32>)."""
    return np.unique(trigram_array(norm))


def shared_trigram_count(candidate_norm: bytes, query_trigrams: np.ndarray) -> int:
    """Count candidate trigram *occurrences* present in the query set
    (`Trigrams.swift:113-130` — counts per candidate position, not distinct)."""
    if query_trigrams.size == 0:
        return 0
    cand = trigram_array(candidate_norm)
    if cand.size == 0:
        return 0
    return int(np.isin(cand, query_trigrams).sum())


def passes_trigram_filter(
    candidate_norm: bytes, query_trigrams: np.ndarray, max_edit_distance: int
) -> bool:
    """Shared count >= |Qtri| - 3*maxED (`Trigrams.swift:161-177`)."""
    if query_trigrams.size == 0:
        return True
    shared = shared_trigram_count(candidate_norm, query_trigrams)
    return shared >= query_trigrams.size - 3 * max_edit_distance


def jaccard(a: np.ndarray, b: np.ndarray) -> float:
    """Exact Jaccard of two distinct-trigram arrays."""
    if a.size == 0 and b.size == 0:
        return 1.0
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 0.0
