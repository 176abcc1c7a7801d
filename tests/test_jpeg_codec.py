"""Pure-numpy baseline JPEG codec tests: round-trip fidelity, batch ==
single equivalence, container structure, decoder fallback paths, and a
Pillow cross-check that runs wherever PIL is installed (the bytes are
standard JFIF — any conforming decoder must read them)."""

import numpy as np
import pytest

from fuzzymatch_spark.sources.images import psnr, synth_pixels
from fuzzymatch_spark.sources.jpeg import (
    _parse_segments,
    jpeg_decode,
    jpeg_decode_batch,
    jpeg_encode,
    jpeg_encode_batch,
)


class TestRoundTrip:
    def test_psnr_at_corpus_quality(self):
        for i in range(20):
            px = synth_pixels(f"jrt{i}")
            assert psnr(px, jpeg_decode(jpeg_encode(px, 95))) >= 40.0

    def test_odd_shapes(self):
        rng = np.random.RandomState(7)
        for shape in [(1, 1), (7, 5), (8, 8), (17, 31), (64, 48), (100, 3)]:
            px = rng.randint(0, 256, shape).astype(np.uint8)
            dec = jpeg_decode(jpeg_encode(px, 90))
            assert dec.shape == shape
            # pure random noise is JPEG's worst case; bound loosely
            assert psnr(px, dec) > 20.0

    def test_flat_and_extreme_images(self):
        for v in (0, 128, 255):
            px = np.full((24, 40), v, dtype=np.uint8)
            assert np.array_equal(jpeg_decode(jpeg_encode(px, 90)), px)

    def test_deterministic_bytes(self):
        px = synth_pixels("jdet")
        assert jpeg_encode(px, 92) == jpeg_encode(px, 92)


class TestBatch:
    def test_batch_encode_equals_single(self):
        pxs = [synth_pixels(f"jb{i}") for i in range(60)]
        batch = jpeg_encode_batch(pxs, 95)
        single = [jpeg_encode(px, 95) for px in pxs]
        assert batch == single

    def test_batch_decode_equals_single(self):
        pxs = [synth_pixels(f"jd{i}") for i in range(60)]
        datas = jpeg_encode_batch(pxs, 95)
        batch = jpeg_decode_batch(datas)
        single = [jpeg_decode(d) for d in datas]
        assert all(np.array_equal(a, b) for a, b in zip(batch, single))

    def test_mixed_qualities_and_shapes_in_one_batch(self):
        rng = np.random.RandomState(3)
        pxs = [synth_pixels(f"jm{i}") for i in range(10)] + [
            rng.randint(0, 256, (19 + i, 27 + i)).astype(np.uint8)
            for i in range(5)
        ]
        datas = jpeg_encode_batch(pxs[:10], 95) + jpeg_encode_batch(
            pxs[10:], 85
        )
        out = jpeg_decode_batch(datas)
        ref = [jpeg_decode(d) for d in datas]
        assert all(np.array_equal(a, b) for a, b in zip(out, ref))

    def test_chunking_boundary(self):
        pxs = [synth_pixels(f"jc{i}") for i in range(97)]  # crosses 2*48
        assert jpeg_encode_batch(pxs, 95, chunk=48) == [
            jpeg_encode(px, 95) for px in pxs
        ]


class TestContainer:
    def test_marker_structure(self):
        data = jpeg_encode(synth_pixels("jmk"), 95)
        assert data[:2] == b"\xff\xd8" and data[-2:] == b"\xff\xd9"
        seg = _parse_segments(data)
        h, w, _cid, tq = seg["sof"]
        assert (h, w) == (48, 48)
        assert tq in seg["dqt"] and len(seg["dqt"][tq]) == 64
        # both entropy tables present and identical (the shared-table
        # choice that makes the decoder's fast path context-free)
        assert seg["dht"][(0, 0)] == seg["dht"][(1, 0)]
        assert seg.get("fmsj") is True

    def test_decode_without_producer_tag_matches(self):
        # stripping the APP15 tag forces the sequential interpretation
        # path; pixels must be identical (the tag only gates the fast path)
        data = jpeg_encode(synth_pixels("jtag"), 95)
        i = data.index(b"\xff\xef")
        ln = int.from_bytes(data[i + 2 : i + 4], "big")
        stripped = data[:i] + data[i + 2 + ln :]
        assert _parse_segments(stripped).get("fmsj") is None
        assert np.array_equal(jpeg_decode(stripped), jpeg_decode(data))
        # and the batch path must fall back, still correct
        out = jpeg_decode_batch([stripped, stripped])
        assert all(np.array_equal(o, jpeg_decode(data)) for o in out)

    def test_truncated_scan_raises(self):
        data = jpeg_encode(synth_pixels("jtr"), 95)
        with pytest.raises((ValueError, IndexError)):
            jpeg_decode(data[: len(data) // 2])

    def test_not_a_jpeg_raises(self):
        with pytest.raises(ValueError):
            jpeg_decode(b"plainly not a jpeg")


def test_pillow_cross_check():
    """Our bytes ARE standard JFIF: Pillow must decode them to the same
    pixels (up to IDCT rounding), and Pillow-encoded baseline files
    (distinct DC/AC tables — the foreign two-table path) must decode
    through our general decoder.  Skips where PIL is absent; runs
    automatically wherever it exists."""
    PIL_Image = pytest.importorskip("PIL.Image")
    import io

    px = synth_pixels("jpil")
    ours = jpeg_encode(px, 95)
    theirs = np.asarray(
        PIL_Image.open(io.BytesIO(ours)).convert("L"), dtype=np.uint8
    )
    assert theirs.shape == px.shape
    assert psnr(jpeg_decode(ours), theirs) >= 45.0

    buf = io.BytesIO()
    PIL_Image.fromarray(px, mode="L").save(buf, format="JPEG", quality=95)
    mine = jpeg_decode(buf.getvalue())
    assert psnr(px, mine) >= 38.0
