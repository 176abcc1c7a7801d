"""Pure-stdlib PNG codec (zlib + numpy): a REAL codec for the lossless
image leg, replacing the FPNG stand-in container for fmt='png'.

Implements the PNG spec (RFC 2083 / ISO 15948) subset the engine needs:

* 8-bit greyscale (color type 0) and 8-bit RGB (color type 2),
  no interlace, compression method 0 (deflate), filter method 0.
* Decode reconstructs ALL five scanline filter types (None/Sub/Up/
  Average/Paeth) and verifies chunk CRCs.
* Encode picks a per-row filter among None/Sub/Up by the standard
  minimum-sum-of-absolute-differences heuristic, then deflates with
  zlib — so round-trips exercise real filter reconstruction, not just
  the trivial filter-0 path.

This makes the image pipeline's lossless leg (`sources/images.py`
``encode_image``/``decode_image``) produce and consume genuine PNG bytes
with no third-party dependency; Pillow remains the swap-in for lossy
formats (JPEG/WebP).  Reference analog: the decoded-pixel acceptance
criterion in BASELINE.md (PSNR = inf for lossless).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _filter_rows(img: np.ndarray) -> bytes:
    """Per-row adaptive filtering (None/Sub/Up by min sum-of-abs, the
    heuristic from the PNG spec's recommendations), returning the
    filter-type-prefixed scanline stream ready for deflate.

    Fully vectorized over the whole image: the encoder-side filters
    reference the RAW previous scanline (not the reconstruction), so all
    three candidates and their costs are plain 2D array ops — no Python
    loop over rows (the loop version cost 2.4 ms per 48x48 image and
    dominated the image-build stage at 400k images).  Tie-break matches
    the loop (first minimum: None < Sub < Up), so output bytes are
    identical."""
    h = img.shape[0]
    flat = img.reshape(h, -1).astype(np.int16)  # rows of w*channels bytes
    bpp = img.shape[2] if img.ndim == 3 else 1
    stride = flat.shape[1]
    left = np.zeros_like(flat)
    left[:, bpp:] = flat[:, :-bpp]
    up = np.zeros_like(flat)
    up[1:] = flat[:-1]
    cands = np.stack(
        [flat, (flat - left) % 256, (flat - up) % 256]
    )  # (3, h, stride)
    # signed interpretation of the filtered byte, per the spec
    costs = np.abs(((cands + 128) % 256) - 128).sum(axis=2)  # (3, h)
    choice = np.argmin(costs, axis=0)
    out = np.empty((h, stride + 1), dtype=np.uint8)
    out[:, 0] = choice
    out[:, 1:] = np.take_along_axis(
        cands, choice[None, :, None], axis=0
    )[0].astype(np.uint8)
    return out.tobytes()


def png_encode(pixels: np.ndarray, level: int = 6) -> bytes:
    """Encode an 8-bit image to PNG bytes.

    ``pixels``: uint8 array, shape (h, w) for greyscale or (h, w, 3) for
    RGB.  Output is a standard PNG any decoder can read.
    """
    if pixels.dtype != np.uint8:
        raise ValueError(f"png_encode needs uint8 pixels, got {pixels.dtype}")
    if pixels.ndim == 2:
        color_type = 0
    elif pixels.ndim == 3 and pixels.shape[2] == 3:
        color_type = 2
    else:
        raise ValueError(f"unsupported pixel shape {pixels.shape}")
    h, w = pixels.shape[0], pixels.shape[1]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    idat = zlib.compress(_filter_rows(np.ascontiguousarray(pixels)), level)
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, w: int, h: int, channels: int) -> np.ndarray:
    stride = w * channels
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"IDAT stream length {len(raw)} != expected {h * (stride + 1)}"
        )
    data = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    ftypes = data[:, 0]
    rows = data[:, 1:].astype(np.int32)
    if ftypes.size and ftypes.max() <= 2:
        # fast path: None/Sub/Up only (everything our encoder emits).
        # None and Sub rows depend on nothing above them — reconstruct all
        # of them in batch; an Up row adds the reconstruction above it, so
        # each maximal RUN of Up rows is one block cumsum on top of its
        # anchor row.  Per-image work drops from h numpy dispatches to a
        # handful (measured 0.33 -> ~0.05 ms on 48x48; decode sat beside
        # the vectorized encoder as the image-build hot spot at 400k).
        rec = rows.copy()
        sub_rows = np.flatnonzero(ftypes == 1)
        if sub_rows.size:
            rec[sub_rows] = (
                rows[sub_rows]
                .reshape(sub_rows.size, w, channels)
                .cumsum(axis=1)
                .reshape(sub_rows.size, stride)
                % 256
            )
        up_rows = np.flatnonzero(ftypes == 2)
        if up_rows.size:
            # maximal runs of consecutive Up rows
            starts = up_rows[
                np.flatnonzero(np.diff(up_rows, prepend=up_rows[0] - 2) > 1)
            ]
            for s in starts:
                e = s
                while e + 1 < h and ftypes[e + 1] == 2:
                    e += 1
                anchor = rec[s - 1] if s else np.zeros(stride, dtype=np.int32)
                rec[s : e + 1] = (
                    rows[s : e + 1].cumsum(axis=0) + anchor
                ) % 256
        img = rec.astype(np.uint8)
        return (
            img.reshape(h, w) if channels == 1 else img.reshape(h, w, channels)
        )
    out = np.zeros((h, stride), dtype=np.int32)
    bpp = channels
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        f = int(ftypes[y])
        row = rows[y]
        if f == 0:
            rec = row.copy()
        elif f == 1:  # Sub: recon[x] = filt[x] + recon[x-bpp]
            rec = row.reshape(w, bpp).cumsum(axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (row + prev) % 256
        elif f == 3:  # Average
            rec = np.zeros(stride, dtype=np.int32)
            for x in range(w):
                s, e = x * bpp, (x + 1) * bpp
                left = rec[s - bpp:s] if x else np.zeros(bpp, dtype=np.int32)
                rec[s:e] = (row[s:e] + ((left + prev[s:e]) >> 1)) % 256
        elif f == 4:  # Paeth
            rec = np.zeros(stride, dtype=np.int32)
            zero = np.zeros(bpp, dtype=np.int32)
            for x in range(w):
                s, e = x * bpp, (x + 1) * bpp
                a = rec[s - bpp:s] if x else zero
                b = prev[s:e]
                c = prev[s - bpp:s] if x else zero
                p = a + b - c
                pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
                pred = np.where(
                    (pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)
                )
                rec[s:e] = (row[s:e] + pred) % 256
        else:
            raise ValueError(f"bad PNG filter type {f} on row {y}")
        out[y] = rec
        prev = rec
    img = out.astype(np.uint8)
    return img.reshape(h, w) if channels == 1 else img.reshape(h, w, channels)


def png_decode(data: bytes) -> np.ndarray:
    """Decode PNG bytes to a uint8 array: (h, w) for greyscale, (h, w, 3)
    for RGB.  Verifies the signature and every chunk CRC; supports the
    encode subset (8-bit, color types 0/2, no interlace) plus filter
    types 0-4 from any conforming encoder."""
    if data[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        ctype = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        # ancillary chunks (tEXt, pHYs, ...) are skipped
        pos += 12 + length
    if ihdr is None:
        raise ValueError("missing IHDR")
    w, h, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise ValueError(
            f"unsupported PNG: depth={depth} comp={comp} filter={filt} "
            f"interlace={interlace} (8-bit non-interlaced only)"
        )
    if color_type == 0:
        channels = 1
    elif color_type == 2:
        channels = 3
    else:
        raise ValueError(
            f"unsupported color type {color_type} (grey=0 / RGB=2 only)"
        )
    return _unfilter(zlib.decompress(bytes(idat)), w, h, channels)


def rgb_to_grey(px: np.ndarray) -> np.ndarray:
    """ITU-R 601 luma, truncating like Pillow's ``convert('L')``."""
    if px.ndim == 2:
        return px
    r = px[..., 0].astype(np.uint32)
    g = px[..., 1].astype(np.uint32)
    b = px[..., 2].astype(np.uint32)
    return ((r * 299 + g * 587 + b * 114) // 1000).astype(np.uint8)
