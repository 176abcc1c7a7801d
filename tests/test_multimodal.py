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
    """Real MJPEG AVI since late r6: frames round-trip at JPEG-q95
    fidelity (>= 40 dB — the input_hint lossy invariant) inside a
    structurally conforming RIFF AVI (spec-sized avih/strh/strf, movi
    frame chunks, idx1 index)."""
    import struct

    from fuzzymatch_spark.sources.images import psnr

    frames = [synth_pixels(f"f{i}", 32, 32) for i in range(6)]
    data = encode_video(frames)
    assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
    for tag, want in ((b"avih", 56), (b"strh", 56), (b"strf", 40)):
        i = data.index(tag)
        assert struct.unpack("<I", data[i + 4 : i + 8])[0] == want
    assert b"movi" in data and b"idx1" in data and b"00dc" in data
    back = decode_video(data)
    assert len(back) == 6
    assert all(a.shape == b.shape for a, b in zip(frames, back))
    assert min(psnr(a, b) for a, b in zip(frames, back)) >= 40.0


def test_video_legacy_fvid_container_still_decodes():
    import struct

    from fuzzymatch_spark.operators import multimodal as mm
    from fuzzymatch_spark.sources.images import encode_image

    frame = synth_pixels("legacy", 32, 32)
    blob = encode_image(frame, "png")
    legacy = (
        mm._MAGIC_VID + struct.pack("<H", 1)
        + struct.pack("<I", len(blob)) + blob
    )
    back = decode_video(legacy)
    assert len(back) == 1 and np.array_equal(back[0], frame)


def test_video_rejects_unknown_container():
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        decode_video(b"RIFF\x00\x00\x00\x00WEBM")


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


# ----------------------------------------------------- shot boundaries

def test_shot_boundaries_golden(spark):
    from fuzzymatch_spark.operators.multimodal import shot_boundaries

    base_a, base_b = 0x2AAA5555AAAA5555, 0x1234FEDC9876ABCD
    rows = [
        # video v1: frames 0-2 near base_a (<=2 bit flips), 3-5 near base_b
        ("v1", 0, base_a), ("v1", 1, base_a ^ 3), ("v1", 2, base_a ^ 1),
        ("v1", 3, base_b), ("v1", 4, base_b ^ 2), ("v1", 5, base_b ^ 3),
        # video v2: single shot
        ("v2", 0, base_a), ("v2", 1, base_a ^ 1),
    ]
    frames = spark.createDataFrame(
        rows, "video_id string, frame_idx int, frame_phash long"
    )
    out = {(r["video_id"], r["shot_id"]): r for r in
           shot_boundaries(frames).collect()}
    assert len(out) == 3
    assert out[("v1", 1)]["start_idx"] == 0
    assert out[("v1", 1)]["end_idx"] == 2
    assert out[("v1", 1)]["n_frames"] == 3
    assert out[("v1", 2)]["start_idx"] == 3
    assert out[("v1", 2)]["n_frames"] == 3
    assert out[("v2", 1)]["n_frames"] == 2
    assert out[("v1", 1)]["keyframe_idx"] == 1   # middle of [0,1,2]
    assert out[("v1", 2)]["keyframe_idx"] == 4   # middle of [3,4,5]


def test_shot_boundaries_keyframe_is_existing_frame(spark):
    from fuzzymatch_spark.operators.multimodal import shot_boundaries

    # sparse/sampled frame indices: the keyframe must be a REAL index
    # (the arithmetic midpoint of {0, 10, 40} is 20 — not a frame)
    a = 0x0F0F
    frames = spark.createDataFrame(
        [("v", 0, a), ("v", 10, a ^ 1), ("v", 40, a ^ 2)],
        "video_id string, frame_idx int, frame_phash long",
    )
    out = shot_boundaries(frames).collect()
    assert len(out) == 1
    assert out[0]["keyframe_idx"] == 10  # middle EXISTING index


def test_shot_boundaries_threshold(spark):
    from fuzzymatch_spark.operators.multimodal import shot_boundaries

    # 21-bit jump: a boundary at the default 16 threshold, not at 24
    a = 0xFF
    frames = spark.createDataFrame(
        [("v", 0, a), ("v", 1, a ^ 0x1FFFFF)],  # 21 bits flipped
        "video_id string, frame_idx int, frame_phash long",
    )
    assert shot_boundaries(frames, max_hamming=16).count() == 2
    assert shot_boundaries(frames, max_hamming=24).count() == 1


# ------------------------------------------------------ audio segments

def test_audio_segments_golden(spark):
    from fuzzymatch_spark.operators.multimodal import audio_segments

    rows = [
        (1, [0.5, 0.6, 0.1, 0.1, 0.7, 0.8, 0.9, 0.0]),  # runs: 2, 3
        (2, [0.0, 0.05, 0.1]),                           # all silent
        (3, [0.9, 0.9, 0.9]),                            # one full run
        (4, []),                                         # empty envelope
    ]
    df = spark.createDataFrame(rows, "clip_id long, envelope array<double>")
    out = {r["clip_id"]: r for r in
           audio_segments(df, threshold=0.2).collect()}
    r1 = out[1]
    assert (r1["n_segments"], r1["longest_run"], r1["n_active"]) == (2, 3, 5)
    assert r1["active_frac"] == 0.625
    assert (out[2]["n_segments"], out[2]["longest_run"]) == (0, 0)
    assert (out[3]["n_segments"], out[3]["longest_run"]) == (1, 3)
    assert (out[4]["n_frames"], out[4]["active_frac"]) == (0, 0.0)


def test_image_caption_gate_branches_and_plan(spark):
    """Every rule binds at its pinned precedence (first-failing wins),
    and the gate is pure projection — zero shuffles, zero Python."""
    from fuzzymatch_spark.operators.multimodal import image_caption_gate

    rows = [
        # precedence: a row failing EVERY rule reports too_small
        ("all_bad", 10, 900, "tiff", "x 1 2"),
        ("keep", 256, 256, "jpeg", "three alpha words"),
        ("small", 63, 256, "png", "three alpha words"),
        ("aspect", 100, 301, "png", "three alpha words"),
        ("fmt", 100, 100, "webp", "three alpha words"),
        ("short", 100, 100, "png", "two  words"),  # double space: 2 toks
        ("alpha", 100, 100, "png", "a1 b2 c3 9999999"),
        ("empty_cap", 100, 100, "png", ""),
        ("null_cap", 100, 100, "png", None),
        ("upper_fmt", 100, 100, "JPEG", "three alpha words"),
        ("null_dim", None, 500, "png", "three alpha words"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, caption string"
    )
    out = image_caption_gate(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan
    got = {r["image_id"]: r for r in out.collect()}
    want = {
        "all_bad": "too_small", "keep": None, "small": "too_small",
        "aspect": "bad_aspect", "fmt": "bad_format",
        "short": "short_caption", "alpha": "low_alpha",
        "empty_cap": "short_caption", "null_cap": "short_caption",
        "upper_fmt": None,
        "null_dim": "too_small",
    }
    for iid, reason in want.items():
        assert got[iid]["reject_reason"] == reason, (iid, got[iid])
        assert got[iid]["keep"] == (reason is None)
    assert got["short"]["caption_tokens"] == 2
    assert got["empty_cap"]["alpha_ratio"] == 0.0
    assert got["aspect"]["aspect"] == 3.01


def test_image_dedup_edges_one_decode_all_legs(spark):
    """The fused composite recovers each planted dup class via its leg —
    re-encode (phash+tier2), mirror (canonical), banner (tiles) — from
    one digest pass, with no cross-image false links."""
    import numpy as np

    from fuzzymatch_spark.config import DedupConfig
    from fuzzymatch_spark.operators.multimodal import image_dedup_edges
    from fuzzymatch_spark.sources.images import encode_image, synth_pixels

    rows = []
    banner = np.full((16, 48), 235, dtype=np.uint8)
    banner[6:10, 4:44] = 20
    for i in range(10):
        px = synth_pixels(f"cb_{i}")
        rows.append((f"orig_{i}", encode_image(px, "png")))
        if i < 3:       # re-encode twin -> phash leg
            rows.append((f"twin_{i}", encode_image(px, "jpeg", quality=85)))
        elif i < 6:     # mirrored twin -> mirror leg
            rows.append((f"twin_{i}", encode_image(
                np.ascontiguousarray(np.fliplr(px)), "png")))
        elif i < 9:     # banner twin -> tiles leg
            tw = px.copy()
            tw[32:48, :] = banner
            rows.append((f"twin_{i}", encode_image(tw, "png")))
    df = spark.createDataFrame(rows, "image_id string, bytes binary")

    edges = image_dedup_edges(df, DedupConfig()).collect()
    srcs = {}
    for r in edges:
        srcs.setdefault((r["a_id"], r["b_id"]), set()).add(r["source"])
    for i in range(9):
        pair = (f"orig_{i}", f"twin_{i}")
        want = "phash" if i < 3 else ("mirror" if i < 6 else "tiles")
        assert pair in srcs and want in srcs[pair], (pair, srcs.get(pair))
    # no cross-image links: every edge pairs a base with ITS twin
    for (a, b) in srcs:
        assert a.split("_")[1] == b.split("_")[1], (a, b)


def test_aspect_buckets_golden_and_plan(spark):
    """Nearest-ratio ladder assignment with pinned goldens at both ends
    of the ladder, downscale flag from true-vs-bucket area, and the
    scale gate: pure projection, zero shuffles, zero Python."""
    from fuzzymatch_spark.operators.multimodal import aspect_buckets

    rows = [
        ("sq", 1000, 1000),      # 1024x1024; 1e6 < 1024^2 -> no downscale
        ("sq_big", 2000, 2000),  # 1024x1024; downscale
        ("tall", 400, 1200),     # a=1/3: 576/1792 (d=1.037) beats 640/1600
        ("wide", 1200, 400),     # mirrored ladder side
        ("pan", 4000, 500),      # a=8 clamps to the ladder end
    ]
    df = spark.createDataFrame(rows, "image_id string, w int, h int")
    out = aspect_buckets(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan, plan
    got = {r["image_id"]: r for r in out.collect()}
    assert (
        got["sq"]["bucket_w"], got["sq"]["bucket_h"], got["sq"]["downscale"]
    ) == (1024, 1024, 0)
    assert (got["sq_big"]["bucket_w"], got["sq_big"]["downscale"]) == (1024, 1)
    assert (got["tall"]["bucket_w"], got["tall"]["bucket_h"]) == (576, 1792)
    assert (got["wide"]["bucket_w"], got["wide"]["bucket_h"]) == (1792, 576)
    assert (got["pan"]["bucket_w"], got["pan"]["bucket_h"]) == (2048, 512)
    assert got["tall"]["downscale"] == 0  # 480k < 576*1792


def test_aspect_buckets_tie_breaks_to_lower_index(spark):
    """Two buckets with identical aspect produce exactly equal ratio
    distances — the argmin must break toward the lower ladder index."""
    from fuzzymatch_spark.operators.multimodal import aspect_buckets

    df = spark.createDataFrame(
        [("t", 500, 500)], "image_id string, w int, h int"
    )
    got = aspect_buckets(df, buckets=((128, 128), (256, 256))).collect()[0]
    assert (got["bucket_w"], got["bucket_h"], got["downscale"]) == (128, 128, 1)


def test_canonical_image_selection(spark):
    """Per-cluster best-resolution survivor: max pixels, ties by min id;
    singletons are their own canonical."""
    from fuzzymatch_spark.operators.multimodal import (
        canonical_image_selection,
    )

    rows = [(1, 10, 100), (2, 10, 300), (3, 10, 300), (4, 40, 50)]
    df = spark.createDataFrame(
        rows, "image_id long, cluster_id long, pixels long"
    )
    out = canonical_image_selection(df)
    got = {r["image_id"]: r["is_canonical"] for r in out.collect()}
    assert got == {1: 0, 2: 1, 3: 0, 4: 1}
    assert set(out.columns) == {
        "image_id", "cluster_id", "pixels", "is_canonical"
    }


def test_bucket_batches_deterministic_and_sized(spark):
    """Stable (shard, batch_idx) assignment: batches fill to batch_size
    within each (bucket, shard), ids map to the same batch on re-run,
    and invalid sizes raise."""
    from fuzzymatch_spark.operators.multimodal import bucket_batches

    rows = [(f"img_{i:03d}", 1024, 1024) for i in range(40)]
    df = spark.createDataFrame(
        rows, "image_id string, bucket_w int, bucket_h int"
    )
    out1 = bucket_batches(df, batch_size=4, n_shards=2)
    got1 = {r["image_id"]: (r["shard"], r["batch_idx"]) for r in out1.collect()}
    assert set(v[0] for v in got1.values()) <= {0, 1}
    # within each shard: batches 0..k full at 4 except possibly the last
    import collections
    per = collections.defaultdict(list)
    for iid, (sh, b) in got1.items():
        per[(sh, b)].append(iid)
    for (sh, b), members in per.items():
        is_last = b == max(bb for ss, bb in per if ss == sh)
        assert len(members) == 4 or is_last, (sh, b, members)
    # id order within (shard, batch): batch 0 ids all sort before batch 1
    for sh in {s for s, _ in per}:
        batches = sorted(b for s, b in per if s == sh)
        flat = [i for b in batches for i in sorted(per[(sh, b)])]
        assert flat == sorted(flat)
    # re-run identical
    got2 = {
        r["image_id"]: (r["shard"], r["batch_idx"])
        for r in bucket_batches(df, batch_size=4, n_shards=2).collect()
    }
    assert got1 == got2
    # invariant to input partitioning (the window orders within its
    # partition keys, so physical layout cannot leak into batch ids)
    got3 = {
        r["image_id"]: (r["shard"], r["batch_idx"])
        for r in bucket_batches(
            df.repartition(7), batch_size=4, n_shards=2
        ).collect()
    }
    assert got1 == got3
    with pytest.raises(ValueError):
        bucket_batches(df, batch_size=0)
    with pytest.raises(ValueError):
        bucket_batches(df, batch_size=4, n_shards=0)


def test_gate_keep_predicate_matches_table_form(spark):
    """The inline-filter form (the pipeline's zero-shuffle survivor cut)
    keeps exactly the rows the table-producing gate marks keep=1, and
    the plan is a bare Filter — no Join, no Exchange, no Python."""
    from fuzzymatch_spark.operators.multimodal import (
        gate_keep_predicate,
        image_caption_gate,
    )

    rows = [
        ("keep", 256, 256, "jpeg", "three alpha words"),
        ("small", 63, 256, "png", "three alpha words"),
        ("aspect", 100, 301, "png", "three alpha words"),
        ("fmt", 100, 100, "webp", "three alpha words"),
        ("short", 100, 100, "png", "two  words"),
        ("alpha", 100, 100, "png", "a1 b2 c3 9999999"),
        ("null_cap", 100, 100, "png", None),
        ("null_dim", None, 500, "png", "three alpha words"),
        ("keep2", 640, 480, "png", "another fine caption"),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, w int, h int, fmt string, caption string"
    )
    filtered = df.where(gate_keep_predicate())
    plan = filtered._jdf.queryExecution().executedPlan().toString()
    for bad in ("Join", "Exchange", "Python"):
        assert bad not in plan, plan
    got = {r["image_id"] for r in filtered.collect()}
    want = {
        r["image_id"]
        for r in image_caption_gate(df).collect()
        if r["keep"]
    }
    assert got == want == {"keep", "keep2"}


def test_resize_rect_matches_bruteforce():
    """Rectangular area-average resize: every output cell equals the
    mean of its source box (integral-image sums are exact integers for
    uint8 input), across down/up/mixed-scale shapes."""
    from fuzzymatch_spark.kernels.phash import _resize_rect, _resize_to

    rng = np.random.default_rng(7)
    for h, w, oh, ow in (
        (37, 53, 8, 16), (64, 64, 32, 32), (5, 9, 8, 4), (100, 30, 16, 48),
    ):
        px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
        got = _resize_rect(px, oh, ow)
        assert got.shape == (oh, ow)
        ys = [i * h // oh for i in range(oh + 1)]
        xs = [j * w // ow for j in range(ow + 1)]
        for i in range(oh):
            for j in range(ow):
                y0, y1 = ys[i], min(max(ys[i + 1], ys[i] + 1), h)
                x0, x1 = xs[j], min(max(xs[j + 1], xs[j] + 1), w)
                want = px[y0:y1, x0:x1].astype(np.float64).mean()
                assert got[i, j] == want, (i, j)
    # the square path is the rect path by construction
    px = rng.integers(0, 256, size=(41, 29), dtype=np.uint8)
    assert np.array_equal(_resize_to(px, 32), _resize_rect(px, 32, 32))


def test_resize_to_buckets_exact_and_plan(spark):
    """Payload half of aspect bucketing: every image lands at its
    bucket's exact dims, the PNG round-trips the resampled pixels
    bit-exactly, and the plan has no Exchange (bucket dims recomputed
    inline from row metadata — no manifest join, bytes never shuffle)."""
    from fuzzymatch_spark.kernels.phash import _resize_rect
    from fuzzymatch_spark.operators.multimodal import resize_to_buckets
    from fuzzymatch_spark.sources.images import (
        decode_image,
        encode_image,
        synth_pixels,
    )

    ladder = ((16, 32), (24, 24), (32, 16))
    spec = {"a": (20, 40), "b": (30, 30), "c": (48, 20)}  # id -> (w, h)
    pixels = {iid: synth_pixels(iid, w, h) for iid, (w, h) in spec.items()}
    rows = [
        (iid, encode_image(pixels[iid], "png"), w, h, "png")
        for iid, (w, h) in spec.items()
    ]
    df = spark.createDataFrame(
        rows, "image_id string, bytes binary, w int, h int, fmt string"
    )
    out = resize_to_buckets(df, buckets=ladder)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, plan
    got = {r["image_id"]: r for r in out.collect()}
    want_bucket = {"a": (16, 32), "b": (24, 24), "c": (32, 16)}
    for iid, (bw, bh) in want_bucket.items():
        assert (got[iid]["w"], got[iid]["h"]) == (bw, bh), iid
        back = decode_image(bytes(got[iid]["bytes"]))
        assert back.shape == (bh, bw)
        want_px = np.clip(
            np.rint(_resize_rect(pixels[iid], bh, bw)), 0, 255
        ).astype(np.uint8)
        assert np.array_equal(back, want_px), iid


def test_survivor_payload_filter_exact_and_plan(spark, tmp_path):
    """Delivering the (non-inline) canonical verdict to the bytes: the
    kept set must be EXACTLY the non-dropped ids — including under a
    deliberately undersized Bloom (bits_per_id=1, heavy false positives,
    so the ids-only recovery path is exercised for real) — and the
    payload side must stay out of every Exchange: one scan streamed
    through a BroadcastHashJoin, ids-only shuffles confined to the
    broadcast-build subtree, no Python stage anywhere."""
    from fuzzymatch_spark.operators.multimodal import survivor_payload_filter

    rows = [(f"img_{i}", bytes([i % 256]) * 16) for i in range(400)]
    path = str(tmp_path / "payload")
    spark.createDataFrame(
        rows, "image_id string, bytes binary"
    ).write.parquet(path)
    df = spark.read.parquet(path)
    drops = spark.createDataFrame(
        [(f"img_{i}",) for i in range(0, 400, 3)], "image_id string"
    )
    expected = {f"img_{i}" for i in range(400) if i % 3 != 0}

    out = survivor_payload_filter(df, drops)
    # plan audit BEFORE collect (AQE re-prints finalized stages after):
    # the fp-recovery subtree reads ids only (parquet prunes bytes from
    # its scan), so every byte-bearing ref sits above the first
    # BroadcastExchange and the only hashpartitioning Exchange (the
    # ids-only anti-join) lives inside that subtree
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, plan
    assert "Python" not in plan, plan
    bidx = plan.index("BroadcastExchange")
    assert "bytes#" not in plan[bidx:], plan[bidx:]
    assert "Exchange hashpartitioning" not in plan[:bidx], plan[:bidx]

    assert {r["image_id"] for r in out.collect()} == expected

    # undersized filter: ~38% fp rate forces the recovery join to matter
    out_fp = survivor_payload_filter(df, drops, bits_per_id=1)
    assert {r["image_id"] for r in out_fp.collect()} == expected

    # empty drop set: identity, no bloom built
    assert survivor_payload_filter(df, drops.limit(0)).count() == 400

    # explicit small-corpus delivery: one plain anti-join, same output
    out_aj = survivor_payload_filter(df, drops, delivery="anti_join")
    assert {r["image_id"] for r in out_aj.collect()} == expected
    with pytest.raises(ValueError, match="delivery"):
        survivor_payload_filter(df, drops, delivery="semi")


def test_decontaminate_images_radius_and_plan(spark):
    """Image decontamination: planted bench twins within the radius flag
    exactly their corpus rows; at-radius matches count, radius+1 does
    not; a hamming-0 pair matching through EVERY combo still counts one
    distinct bench hit; and the corpus side never reaches a
    SortMergeJoin (broadcast-only delivery)."""
    from fuzzymatch_spark.operators.multimodal import decontaminate_images

    import hashlib

    def h64(i):
        # well-spread 63-bit hashes: expected pairwise Hamming ~32, so
        # nothing lands within radius 6 by chance among 200 rows
        return int.from_bytes(
            hashlib.md5(f"img{i}".encode()).digest()[:8], "big"
        ) >> 1

    corpus = spark.createDataFrame(
        [(f"c_{i}", h64(i)) for i in range(200)],
        "image_id string, phash long",
    )
    flip2 = (1 << 0) | (1 << 57)          # hamming 2 from c_5
    flip6 = 0x3F                           # hamming 6 (at radius) from c_10
    flip7 = 0x7F                           # hamming 7 (beyond) from c_20
    bench = spark.createDataFrame(
        [
            ("b_exact", h64(5)),             # hamming 0 vs c_5
            ("b_near", h64(5) ^ flip2),      # hamming 2 vs c_5
            ("b_edge", h64(10) ^ flip6),     # hamming 6 vs c_10
            ("b_far", h64(20) ^ flip7),      # hamming 7: clean
        ],
        "bench_id string, phash long",
    )
    out = decontaminate_images(corpus, bench, max_hamming=6)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 2, plan

    rows = {r["image_id"]: r for r in out.collect()}
    assert len(rows) == 200
    dirty = {i for i, r in rows.items() if r["contaminated"] == 1}
    assert dirty == {"c_5", "c_10"}, dirty
    assert rows["c_5"]["n_bench_hits"] == 2          # b_exact + b_near
    assert rows["c_5"]["min_hamming"] == 0           # exact match wins
    assert rows["c_10"]["n_bench_hits"] == 1
    assert rows["c_10"]["min_hamming"] == 6          # at-radius boundary
    assert rows["c_20"]["n_bench_hits"] == 0
    assert rows["c_20"]["min_hamming"] is None

    with pytest.raises(ValueError, match="max_hamming"):
        decontaminate_images(corpus, bench, max_hamming=-1)


def test_survivor_payload_filter_sharded_matches_unsharded(spark):
    """Hash-aligned sharding: the union of per-shard Bloom passes must
    equal the single-pass output exactly (the beyond-broadcast-budget
    escape hatch), for shard counts that do and don't divide the data
    evenly — including n_shards=1 (degenerate) and a forced-FP filter."""
    from fuzzymatch_spark.operators.multimodal import (
        survivor_payload_filter,
        survivor_payload_filter_sharded,
    )

    rows = [(f"img_{i}", bytes([i % 256]) * 8) for i in range(300)]
    df = spark.createDataFrame(rows, "image_id string, bytes binary")
    drops = spark.createDataFrame(
        [(f"img_{i}",) for i in range(0, 300, 7)], "image_id string"
    )
    want = {r["image_id"]
            for r in survivor_payload_filter(df, drops).collect()}
    for n_shards in (1, 3, 8):
        got = {r["image_id"] for r in survivor_payload_filter_sharded(
            df, drops, n_shards=n_shards).collect()}
        assert got == want, n_shards
    # undersized filter: the fp-recovery path must stay exact per shard
    got_fp = {r["image_id"] for r in survivor_payload_filter_sharded(
        df, drops, n_shards=4, bits_per_id=1).collect()}
    assert got_fp == want

    with pytest.raises(ValueError, match="n_shards"):
        survivor_payload_filter_sharded(df, drops, n_shards=0)
