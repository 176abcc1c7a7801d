"""Real-codec tests for the pure-stdlib PNG implementation
(`fuzzymatch_spark/sources/png.py`) — these RUN in this sandbox (no
Pillow needed) and exercise a genuine lossless round-trip, independent
filter reconstruction, CRC checking, and the `decode_image` dispatch.
"""

import struct
import zlib

import numpy as np
import pytest

from fuzzymatch_spark.sources.images import (
    decode_image,
    encode_image,
    psnr,
    synth_pixels,
)
from fuzzymatch_spark.sources.png import (
    PNG_SIGNATURE,
    png_decode,
    png_encode,
    rgb_to_grey,
)


def _ref_chunk(ctype: bytes, data: bytes) -> bytes:
    crc = zlib.crc32(ctype + data) & 0xFFFFFFFF
    return struct.pack(">I", len(data)) + ctype + data + struct.pack(">I", crc)


def _ref_png(filtered_stream: bytes, w: int, h: int, color_type: int) -> bytes:
    """Independent minimal PNG writer used to hand-build decode vectors —
    shares nothing with the encoder under test except zlib."""
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        PNG_SIGNATURE
        + _ref_chunk(b"IHDR", ihdr)
        + _ref_chunk(b"IDAT", zlib.compress(filtered_stream))
        + _ref_chunk(b"IEND", b"")
    )


class TestRoundTrip:
    def test_grey_lossless(self):
        rng = np.random.RandomState(7)
        px = rng.randint(0, 256, size=(37, 53), dtype=np.uint8)
        data = png_encode(px)
        assert data[:8] == PNG_SIGNATURE
        assert np.array_equal(png_decode(data), px)

    def test_rgb_lossless(self):
        rng = np.random.RandomState(8)
        px = rng.randint(0, 256, size=(21, 17, 3), dtype=np.uint8)
        out = png_decode(png_encode(px))
        assert out.shape == (21, 17, 3)
        assert np.array_equal(out, px)

    def test_smooth_image_uses_nontrivial_filters_and_compresses(self):
        # a gradient row-adaptive filtering should crush; also proves the
        # Sub/Up filter paths are exercised end-to-end, not just filter 0
        px = np.add.outer(
            np.arange(64, dtype=np.uint16), np.arange(64, dtype=np.uint16)
        ).astype(np.uint8)
        data = png_encode(px)
        assert np.array_equal(png_decode(data), px)
        assert len(data) < px.size // 4  # real compression, not a copy

    def test_single_pixel_and_single_row(self):
        for shape in [(1, 1), (1, 9), (9, 1)]:
            px = np.arange(np.prod(shape), dtype=np.uint8).reshape(shape)
            assert np.array_equal(png_decode(png_encode(px)), px)


class TestFilterReconstruction:
    """Decode vectors built by an independent in-test filterer: apply the
    spec formula forward here, assert the decoder inverts it."""

    @pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
    def test_grey_all_filter_types(self, ftype):
        rng = np.random.RandomState(100 + ftype)
        px = rng.randint(0, 256, size=(6, 8), dtype=np.uint8).astype(np.int32)
        h, w = px.shape
        stream = bytearray()
        for y in range(h):
            stream.append(ftype)
            for x in range(w):
                a = px[y, x - 1] if x else 0          # left
                b = px[y - 1, x] if y else 0          # up
                c = px[y - 1, x - 1] if x and y else 0  # up-left
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) >> 1
                else:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                stream.append((px[y, x] - pred) % 256)
        out = png_decode(_ref_png(bytes(stream), w, h, color_type=0))
        assert np.array_equal(out, px.astype(np.uint8)), f"filter {ftype}"

    def test_rgb_paeth(self):
        rng = np.random.RandomState(42)
        px = rng.randint(0, 256, size=(5, 4, 3), dtype=np.uint8).astype(np.int32)
        h, w, ch = px.shape
        stream = bytearray()
        for y in range(h):
            stream.append(4)
            for x in range(w):
                for k in range(ch):
                    a = px[y, x - 1, k] if x else 0
                    b = px[y - 1, x, k] if y else 0
                    c = px[y - 1, x - 1, k] if x and y else 0
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    stream.append((px[y, x, k] - pred) % 256)
        out = png_decode(_ref_png(bytes(stream), w, h, color_type=2))
        assert np.array_equal(out, px.astype(np.uint8))


class TestRobustness:
    def test_bad_signature_rejected(self):
        with pytest.raises(ValueError, match="signature"):
            png_decode(b"\x89PNG\r\n\x1a\x00" + b"x" * 32)

    def test_crc_mismatch_rejected(self):
        data = bytearray(png_encode(np.zeros((4, 4), dtype=np.uint8)))
        data[20] ^= 0xFF  # corrupt IHDR body
        with pytest.raises(ValueError, match="CRC"):
            png_decode(bytes(data))

    def test_ancillary_chunks_skipped(self):
        px = np.arange(16, dtype=np.uint8).reshape(4, 4)
        data = png_encode(px)
        # splice a tEXt chunk between IHDR and IDAT
        ihdr_end = 8 + 12 + 13
        text = _ref_chunk(b"tEXt", b"Comment\x00hello")
        spliced = data[:ihdr_end] + text + data[ihdr_end:]
        assert np.array_equal(png_decode(spliced), px)

    def test_unsupported_depth_rejected(self):
        ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 0, 0, 0, 0)
        bad = (
            PNG_SIGNATURE
            + _ref_chunk(b"IHDR", ihdr)
            + _ref_chunk(b"IDAT", zlib.compress(b"\x00" * 36))
            + _ref_chunk(b"IEND", b"")
        )
        with pytest.raises(ValueError, match="unsupported"):
            png_decode(bad)

    def test_bad_filter_type_rejected(self):
        stream = b"\x05" + b"\x00" * 4
        with pytest.raises(ValueError, match="filter type"):
            png_decode(_ref_png(stream, 4, 1, color_type=0))


class TestEngineDispatch:
    """The acceptance criterion from VERDICT r5 item 4: the real-codec
    PSNR check runs in-sandbox against genuine PNG bytes."""

    def test_encode_image_png_is_real_png(self):
        px = synth_pixels("real-png-leg")
        data = encode_image(px, "png")
        assert data[:8] == PNG_SIGNATURE
        decoded = decode_image(data)
        assert np.array_equal(decoded, px)
        assert psnr(px, decoded) == float("inf")  # real lossless round-trip

    def test_decode_image_rgb_png_to_luma(self):
        rng = np.random.RandomState(3)
        rgb = rng.randint(0, 256, size=(12, 10, 3), dtype=np.uint8)
        out = decode_image(png_encode(rgb))
        assert out.shape == (12, 10)
        assert np.array_equal(out, rgb_to_grey(rgb))

    def test_legacy_standin_containers_still_decode(self):
        from fuzzymatch_spark.sources.images import _MAGIC_PNG

        px = synth_pixels("legacy")
        legacy = (
            _MAGIC_PNG
            + struct.pack("<HH", px.shape[1], px.shape[0])
            + zlib.compress(px.tobytes(), 6)
        )
        assert np.array_equal(decode_image(legacy), px)
