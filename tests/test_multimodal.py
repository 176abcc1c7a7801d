"""Multimodal operator plumbing: resize and video frame-sampling."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.operators.multimodal import (
    decode_video,
    encode_video,
    frame_sample,
    resize_images,
)
from fuzzymatch_spark.sources.images import build_images_df, decode_image, synth_pixels


def test_video_container_roundtrip():
    frames = [synth_pixels(f"f{i}", 32, 32) for i in range(6)]
    data = encode_video(frames)
    back = decode_video(data)
    assert len(back) == 6
    assert all(np.array_equal(a, b) for a, b in zip(frames, back))


def test_resize_images(spark, documents):
    images = build_images_df(spark, documents.limit(20), "doc_id", "text")
    small = resize_images(images, 16, 16).collect()
    assert len(small) >= 20
    for r in small:
        px = decode_image(bytes(r["bytes"]))
        assert px.shape == (16, 16)
        assert r["fmt"] == "png"


def test_frame_sample(spark):
    rows = []
    for v in range(5):
        frames = [synth_pixels(f"v{v}f{i}", 24, 24) for i in range(10)]
        rows.append((f"vid{v}", encode_video(frames)))
    videos = spark.createDataFrame(rows, "video_id string, bytes binary")
    sampled = frame_sample(videos, every_k=3).collect()
    # 10 frames, every 3rd -> indices 0,3,6,9 = 4 per video
    assert len(sampled) == 20
    assert {r["frame_idx"] for r in sampled} == {0, 3, 6, 9}
    assert all(r["w"] == 24 for r in sampled)
    # frame pHashes are real signatures (distinct frames -> distinct-ish)
    assert len({r["frame_phash"] for r in sampled}) > 10


def test_video_dup_pairs_planted(spark):
    """Planted noisy-twin videos are recovered via frame-set containment;
    unrelated videos never pair."""
    import numpy as np
    import pandas as pd

    from fuzzymatch_spark.operators.multimodal import (
        encode_video,
        frame_sample,
        video_dup_pairs,
    )
    from fuzzymatch_spark.sources.images import synth_pixels

    rng = np.random.RandomState(9)
    rows = []
    want = set()
    for v in range(12):
        frames = [synth_pixels(f"v{v}f{i}", 24, 24) for i in range(8)]
        rows.append((f"vid{v:02d}", encode_video(frames)))
        if v % 2 == 0:
            noisy = [
                np.clip(f.astype(np.int16) + rng.randint(-3, 4, f.shape),
                        0, 255).astype(np.uint8)
                for f in frames
            ]
            rows.append((f"vid{v:02d}_dup", encode_video(noisy)))
            want.add((f"vid{v:02d}", f"vid{v:02d}_dup"))

    videos = spark.createDataFrame(rows, "video_id string, bytes binary")
    frames = frame_sample(videos, every_k=2)
    got = {
        (r["a_id"], r["b_id"])
        for r in video_dup_pairs(frames, min_frac=0.5).collect()
    }
    assert got == want, (got, want)
