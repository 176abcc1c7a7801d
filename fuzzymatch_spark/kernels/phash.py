"""Perceptual hash (pHash) over decoded pixels.

Classic DCT pHash: downsample to 32x32 grayscale, 2-D DCT-II, take the
top-left 8x8 low-frequency block, threshold against the block median
(DC excluded from the median) -> 64-bit hash.  Pure numpy; used inside the
``phash_from_bytes`` pandas UDF (no per-row Python at the Spark boundary —
batches are decoded and hashed in one numpy pass each).

Candidate pairs are then generated with the banded Hamming equi-join in
operators/dedup.py and verified JVM-side with ``bit_count(a ^ b)``.
"""

from __future__ import annotations

import numpy as np

_DCT_N = 32
_DCT_M = None


def _dct_matrix(n: int = _DCT_N) -> np.ndarray:
    global _DCT_M
    if _DCT_M is None:
        k = np.arange(n)[:, None]
        i = np.arange(n)[None, :]
        m = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
        m[0, :] = np.sqrt(1.0 / n)
        _DCT_M = m
    return _DCT_M


def _resize_to(pixels: np.ndarray, n: int = _DCT_N) -> np.ndarray:
    """Area-average resample to n x n (deterministic, no image libs)."""
    h, w = pixels.shape
    ys = (np.arange(n + 1) * h // n).astype(np.int64)
    xs = (np.arange(n + 1) * w // n).astype(np.int64)
    # integral image for O(1) box sums
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(pixels.astype(np.float64), axis=0), axis=1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    y1 = np.minimum(y1, h)
    x1 = np.minimum(x1, w)
    sums = (
        ii[y1[:, None], x1[None, :]]
        - ii[y0[:, None], x1[None, :]]
        - ii[y1[:, None], x0[None, :]]
        + ii[y0[:, None], x0[None, :]]
    )
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums / areas


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of a 2-D uint8 grayscale array (signed int)."""
    small = _resize_to(pixels)
    m = _dct_matrix()
    coeffs = m @ small @ m.T
    block = coeffs[:8, :8]
    flat = block.flatten()
    med = np.median(flat[1:])  # exclude DC from the threshold
    bits = (flat > med).astype(np.uint64)
    out = int((bits << np.arange(64, dtype=np.uint64)).sum())
    return out - (1 << 64) if out >= (1 << 63) else out


def dhash64(pixels: np.ndarray) -> int:
    """64-bit difference hash: area-average resample to 8x9, bit k set
    where block (r, c) is brighter than block (r, c+1) — row-wise
    gradients, 8 rows x 8 comparisons (signed int).

    Statistically INDEPENDENT of ``phash64`` on distinct images (spatial
    gradients vs DCT low-frequency signs), which is the property the
    tier-2 verify in ``phash_band_edges`` relies on: a genuine duplicate
    (same pixels, lossy re-encode) stays close in BOTH digests, while a
    random pHash near-collision has ~32-bit dHash distance and is killed.
    """
    h, w = pixels.shape
    n_r, n_c = 8, 9
    ys = (np.arange(n_r + 1) * h // n_r).astype(np.int64)
    xs = (np.arange(n_c + 1) * w // n_c).astype(np.int64)
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(np.cumsum(pixels.astype(np.float64), axis=0), axis=1)
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    y1 = np.minimum(y1, h)
    x1 = np.minimum(x1, w)
    sums = (
        ii[y1[:, None], x1[None, :]]
        - ii[y0[:, None], x1[None, :]]
        - ii[y1[:, None], x0[None, :]]
        + ii[y0[:, None], x0[None, :]]
    )
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    grid = sums / areas  # 8 x 9 block means
    bits = (grid[:, :-1] > grid[:, 1:]).astype(np.uint64).flatten()
    out = int((bits << np.arange(64, dtype=np.uint64)).sum())
    return out - (1 << 64) if out >= (1 << 63) else out


def dihedral_transforms(pixels: np.ndarray):
    """The 8 symmetries of the square (D4) applied to a 2-D array:
    identity, 3 rotations, and the 4 reflections.  Views, no copies."""
    f = np.fliplr(pixels)
    return (
        pixels,
        np.rot90(pixels, 1),
        np.rot90(pixels, 2),
        np.rot90(pixels, 3),
        f,
        np.rot90(f, 1),
        np.rot90(f, 2),
        np.rot90(f, 3),
    )


def phash64_canonical(pixels: np.ndarray) -> int:
    """Dihedral-canonical pHash: the minimum (as uint64) of ``phash64``
    over the 8 symmetries of the square (signed int64 on return, like
    every stored digest).

    EXACTLY invariant under any flip/rotation of the input: the D4
    transforms form a group, so ``{t(g(px)) for t in D4}`` is the same
    set as ``{t(px) for t in D4}`` for any ``g`` in D4 — the min is over
    an identical candidate set, not an approximately-equal one.  (Each
    transform is applied to the FULL-resolution array before its own
    resize, because the area-average grid boundaries ``i*w//32`` are not
    mirror-symmetric when the side is not a multiple of 32 — hashing
    transformed thumbnails instead would break the exact-group
    argument.)

    Mirrored and rotated re-posts are a real duplicate class the plain
    pHash misses: ``fliplr`` negates every odd-column DCT coefficient,
    so roughly half the 8x8 sign block flips — far past any usable
    Hamming radius (asserted in the planted test).  A canonical-hash
    column restores them to Hamming 0 and reuses the existing banded
    Hamming join unchanged.  Measured 8.8x the hashing cost of
    ``phash64`` (0.92 vs 0.11 ms/image on 48x48 synth: 8 resizes +
    8 tiny DCTs); decode still dominates the UDF.
    """
    best = None
    for t in dihedral_transforms(pixels):
        h = phash64(t) & 0xFFFFFFFFFFFFFFFF
        if best is None or h < best:
            best = h
    return best - (1 << 64) if best >= (1 << 63) else best


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
