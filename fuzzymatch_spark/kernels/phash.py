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


def _resize_rect(
    pixels: np.ndarray, out_h: int, out_w: int
) -> np.ndarray:
    """Area-average resample to out_h x out_w (deterministic, no image
    libs) — integral image for O(1) box sums, degenerate boxes clamped
    to >= 1 source pixel for upscales."""
    h, w = pixels.shape
    ys = (np.arange(out_h + 1) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w + 1) * w // out_w).astype(np.int64)
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


def _resize_to(pixels: np.ndarray, n: int = _DCT_N) -> np.ndarray:
    """Area-average resample to n x n (deterministic, no image libs)."""
    return _resize_rect(pixels, n, n)


def _hash_from_small(small: np.ndarray) -> int:
    """DCT + median-threshold bit extraction shared by every pHash path
    (one definition so the fast canonical kernel is bit-identical)."""
    m = _dct_matrix()
    coeffs = m @ small @ m.T
    flat = coeffs[:8, :8].flatten()
    med = np.median(flat[1:])  # exclude DC from the threshold
    bits = (flat > med).astype(np.uint64)
    out = int((bits << np.arange(64, dtype=np.uint64)).sum())
    return out - (1 << 64) if out >= (1 << 63) else out


def phash64(pixels: np.ndarray) -> int:
    """64-bit perceptual hash of a 2-D uint8 grayscale array (signed int)."""
    return _hash_from_small(_resize_to(pixels))


def _resize_rect_batch(stack: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Batched ``_resize_rect`` over a (B, h, w) stack of SAME-SHAPE
    images: per-slice results are bit-identical to the scalar kernel
    (cumsum per image, identical box-sum expression order)."""
    _B, h, w = stack.shape
    ys = (np.arange(out_h + 1) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w + 1) * w // out_w).astype(np.int64)
    ii = np.zeros((stack.shape[0], h + 1, w + 1), dtype=np.float64)
    ii[:, 1:, 1:] = np.cumsum(
        np.cumsum(stack.astype(np.float64), axis=1), axis=2
    )
    y0, y1 = ys[:-1], np.maximum(ys[1:], ys[:-1] + 1)
    x0, x1 = xs[:-1], np.maximum(xs[1:], xs[:-1] + 1)
    y1 = np.minimum(y1, h)
    x1 = np.minimum(x1, w)
    sums = (
        ii[:, y1[:, None], x1[None, :]]
        - ii[:, y0[:, None], x1[None, :]]
        - ii[:, y1[:, None], x0[None, :]]
        + ii[:, y0[:, None], x0[None, :]]
    )
    areas = (y1 - y0)[:, None] * (x1 - x0)[None, :]
    return sums / areas


def _batch_by_shape(imgs, chunk: int, one_shape_fn) -> np.ndarray:
    """Run a same-shape batch kernel over an arbitrary image list: group
    indices by shape, process each group in ``chunk``-bounded stacks (the
    codec lesson: first-touch of huge temporaries is ~20x slower than
    warm reuse — small chunks keep every temp in warm arenas), scatter
    results back in input order."""
    out = np.zeros(len(imgs), dtype=np.int64)
    groups: dict = {}
    for i, px in enumerate(imgs):
        groups.setdefault(px.shape, []).append(i)
    for idxs in groups.values():
        for s in range(0, len(idxs), chunk):
            sel = idxs[s : s + chunk]
            out[sel] = one_shape_fn(np.stack([imgs[i] for i in sel]))
    return out


def _pack_bits_batch(bits: np.ndarray) -> np.ndarray:
    vals = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    return vals.astype(np.int64)  # two's-complement wrap, like the scalar


def phash64_batch(imgs: list, chunk: int = 64) -> np.ndarray:
    """``phash64`` over a list of 2-D uint8 arrays, BIT-IDENTICAL to the
    scalar loop (same resize expression per slice; the DCT runs as
    batched matmuls with the same operands/order — the
    ``phash64_canonical`` precedent; median/threshold vectorized per
    row).  ~1.4x over the scalar loop at the 48-px corpus shape; the
    win is amortized numpy call overhead, not a different algorithm."""

    def one(stack: np.ndarray) -> np.ndarray:
        small = _resize_rect_batch(stack, _DCT_N, _DCT_N)
        m = _dct_matrix()
        coeffs = (m @ small) @ m.T
        flat = coeffs[:, :8, :8].reshape(stack.shape[0], 64)
        med = np.median(flat[:, 1:], axis=1)
        return _pack_bits_batch((flat > med[:, None]).astype(np.uint64))

    return _batch_by_shape(imgs, chunk, one)


def dhash64_batch(imgs: list, chunk: int = 64) -> np.ndarray:
    """``dhash64`` over a list of 2-D uint8 arrays, bit-identical to the
    scalar loop (same 8x9 box means per slice, same row-gradient
    compare)."""

    def one(stack: np.ndarray) -> np.ndarray:
        grid = _resize_rect_batch(stack, 8, 9)
        bits = (grid[:, :, :-1] > grid[:, :, 1:]).astype(np.uint64)
        return _pack_bits_batch(bits.reshape(stack.shape[0], 64))

    return _batch_by_shape(imgs, chunk, one)


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
    Hamming join unchanged.

    Fast path: ONE integral image serves all 8 transforms.  The resize
    boxes of ``t(px)`` are transformed boxes of ``px``, so each
    transform's 32x32 grid reads from the same integral image with
    mapped bounds — and because box sums of uint8 pixels are exact
    integers in float64 (< 2^53 for any real image), the grids are
    bit-identical to running ``_resize_to`` on each materialized
    transform (pinned by the 300-random-shape equality test).  All 8
    DCTs run as two batched matmuls.  Measured 2.2x over the
    8-pipeline loop (0.56 vs 1.23 ms/image on 48x48 synth).
    """
    h, w = pixels.shape
    n = _DCT_N
    ii = np.zeros((h + 1, w + 1), dtype=np.float64)
    ii[1:, 1:] = np.cumsum(
        np.cumsum(pixels.astype(np.float64), axis=0), axis=1
    )

    def bounds(length: int):
        es = (np.arange(n + 1) * length // n).astype(np.int64)
        b0 = es[:-1]
        b1 = np.minimum(np.maximum(es[1:], b0 + 1), length)
        return b0, b1

    bh0, bh1 = bounds(h)
    bw0, bw1 = bounds(w)

    def grid(r0, r1, r_ax, c0, c1, c_ax):
        # output[i, j] = mean of px[r0:r1, c0:c1], where the row bounds
        # vary along output axis r_ax and the col bounds along c_ax
        def ix(a, ax):
            return a[:, None] if ax == 0 else a[None, :]

        R0, R1 = ix(r0, r_ax), ix(r1, r_ax)
        C0, C1 = ix(c0, c_ax), ix(c1, c_ax)
        s = ii[R1, C1] - ii[R0, C1] - ii[R1, C0] + ii[R0, C0]
        return s / ((R1 - R0) * (C1 - C0))

    # one row per D4 element: t(px)[i, j] = px[rows, cols] with the
    # boundary arrays (and their output axes) derived in the docstring
    cases = (
        (bh0, bh1, 0, bw0, bw1, 1),                    # identity
        (bh0, bh1, 1, w - bw1, w - bw0, 0),            # rot90
        (h - bh1, h - bh0, 0, w - bw1, w - bw0, 1),    # rot180
        (h - bh1, h - bh0, 1, bw0, bw1, 0),            # rot270
        (bh0, bh1, 0, w - bw1, w - bw0, 1),            # fliplr
        (bh0, bh1, 1, bw0, bw1, 0),                    # transpose
        (h - bh1, h - bh0, 0, bw0, bw1, 1),            # flipud
        (h - bh1, h - bh0, 1, w - bw1, w - bw0, 0),    # anti-transpose
    )
    grids = np.stack([grid(*c) for c in cases])
    m = _dct_matrix()
    # all 8 DCTs in two batched matmuls (same operands/order as the
    # scalar path, so results stay bit-identical)
    coeffs = (m @ grids) @ m.T
    flat = coeffs[:, :8, :8].reshape(8, 64)
    med = np.median(flat[:, 1:], axis=1)
    bits = (flat > med[:, None]).astype(np.uint64)
    hashes = (bits << np.arange(64, dtype=np.uint64)[None, :]).sum(axis=1)
    best = int(hashes.min())
    return best - (1 << 64) if best >= (1 << 63) else best


def hamming64(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
