"""Multimodal column operators for training-data pipelines.

Images/audio/video are opaque ``binary`` columns with typed metadata; all
transforms run as Arrow-batched ``mapInPandas`` passes (the Spark-side
plumbing — schema, partitioning, batch shape — is real and tested).

CODEC STATUS (REAL since late r6): video containers are standard
RIFF AVI with an MJPEG video stream — each frame is a real baseline
JFIF produced by ``sources/jpeg.py``, wrapped in the avih/strh/strf
header set plus an idx1 index, so any AVI-capable player/ffmpeg opens
the bytes.  ``decode_video`` chunk-walks any MJPEG AVI (extra chunks
skipped) and batch-decodes the frames; the legacy FVID stand-in
container still decodes (pre-r6 fixtures).  Non-MJPEG codecs
(H.264/VP9/...) would go through PyAV/ffmpeg in production and raise
loudly here.
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from fuzzymatch_spark.kernels.phash import _resize_to, phash64
from fuzzymatch_spark.sources.images import decode_image, encode_image
from fuzzymatch_spark.sources.jpeg import jpeg_decode_batch, jpeg_encode_batch


def resize_images(
    images_df: DataFrame, out_w: int = 32, out_h: int = 32
) -> DataFrame:
    """Decode -> area-average resize -> re-encode (lossless container).

    Returns (image_id, bytes, w, h, fmt) at the new geometry — the standard
    pre-training normalization pass.
    """
    schema = "image_id string, bytes binary, w int, h int, fmt string"

    def go(batches):
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for rid, data in zip(pdf["image_id"], pdf["bytes"]):
                px = decode_image(bytes(data))
                small = np.clip(_resize_to(px, out_h), 0, 255).astype(np.uint8)
                # _resize_to is square; slice to requested aspect
                small = small[:out_h, :out_w]
                out["image_id"].append(rid)
                out["bytes"].append(encode_image(small, "png"))
                out["w"].append(out_w)
                out["h"].append(out_h)
                out["fmt"].append("png")
            yield pd.DataFrame(out)

    return images_df.select("image_id", "bytes").mapInPandas(go, schema=schema)


# --- video container: standard RIFF AVI, MJPEG stream -------------------

_MAGIC_VID = b"FVID"  # legacy stand-in (pre-r6 fixtures still decode)


def _chunk(cid: bytes, body: bytes) -> bytes:
    return cid + struct.pack("<I", len(body)) + body + (
        b"\x00" if len(body) % 2 else b""
    )


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def encode_video(
    frames: list[np.ndarray], fps: int = 10, quality: int = 95
) -> bytes:
    """Encode grayscale frames as a standard MJPEG AVI: RIFF('AVI ')
    with avih/strh/strf headers, one '00dc' chunk of real baseline JFIF
    per frame (``sources/jpeg.py``), and an idx1 keyframe index — the
    structure any AVI-capable player expects."""
    if not frames:
        raise ValueError("encode_video needs at least one frame")
    h, w = frames[0].shape
    blobs = jpeg_encode_batch(list(frames), quality)
    maxb = max(len(b) for b in blobs)
    avih = struct.pack(
        "<10I4I",
        1_000_000 // max(fps, 1), maxb * fps, 0, 0x10,  # usec/frame, rate, pad, HASINDEX
        len(frames), 0, 1, maxb, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIiI4H",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(frames), maxb, -1, 0,
        0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi_chunks = [_chunk(b"00dc", b) for b in blobs]
    movi = _list(b"movi", b"".join(movi_chunks))
    # idx1 offsets are relative to the start of the 'movi' list type tag
    idx_entries = []
    off = 4  # past the 'movi' fourcc
    for b in blobs:
        idx_entries.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(b)))
        off += 8 + len(b) + (len(b) % 2)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def decode_video(data: bytes) -> list[np.ndarray]:
    """Decode an MJPEG AVI (chunk-walking; non-frame chunks skipped) or
    the legacy FVID stand-in container to a list of grayscale frames."""
    if data[:4] == _MAGIC_VID:  # pre-r6 stored fixtures
        (n,) = struct.unpack("<H", data[4:6])
        off = 6
        frames = []
        for _ in range(n):
            (ln,) = struct.unpack("<I", data[off : off + 4])
            off += 4
            frames.append(decode_image(data[off : off + ln]))
            off += ln
        return frames
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError(
            "unknown video container (MJPEG AVI decodes natively; other"
            " codecs need PyAV/ffmpeg)"
        )
    blobs: list[bytes] = []

    def walk(buf: bytes) -> None:
        i = 0
        while i + 8 <= len(buf):
            cid = buf[i : i + 4]
            ln = struct.unpack("<I", buf[i + 4 : i + 8])[0]
            body = buf[i + 8 : i + 8 + ln]
            if cid == b"LIST":
                walk(body[4:])  # skip the list type fourcc
            elif cid[2:4] in (b"dc", b"db"):  # compressed/uncompressed frame
                blobs.append(body)
            i += 8 + ln + (ln % 2)

    walk(data[12:])
    if not blobs:
        raise ValueError("AVI contains no video frame chunks")
    return jpeg_decode_batch(blobs)


def audio_verify_pairs(
    cand: DataFrame,
    clips_df: DataFrame,
    id_col: str = "clip_id",
    env_col: str = "envelope",
    max_rel_rms: float = 0.1,
) -> DataFrame:
    """Verify audio candidate pairs on the compact RMS-envelope digest —
    the audio analog of the caption pipeline's two-tier verify (fingerprint
    bands generate candidates, the signal-level check decides).  Near-dup
    twins (re-encode / mild noise) land at ~1e-3 relative envelope error;
    unrelated clips at O(1).

    Payload discipline: the digest (64 float32) is computed inside
    ``build_audio_df`` where the bytes live; this join ships ONLY ids +
    digests and the comparison is whole-stage-codegen JVM arithmetic — no
    audio bytes in any shuffle, no Python stage (the round-2 version joined
    full ``bytes`` through two shuffles and decoded per pair).
    """
    from pyspark.sql import functions as F2

    envs = clips_df.select(id_col, env_col)
    a = envs.select(F2.col(id_col).alias("a_id"), F2.col(env_col).alias("a_env"))
    b = envs.select(F2.col(id_col).alias("b_id"), F2.col(env_col).alias("b_env"))

    def _sumsq(col):
        return F2.aggregate(
            col, F2.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )

    diff = F2.zip_with(
        "a_env", "b_env", lambda x, y: x.cast("double") - y.cast("double")
    )
    n = F2.greatest(F2.size("a_env"), F2.lit(1))
    rel = F2.sqrt(
        F2.aggregate(diff, F2.lit(0.0), lambda acc, v: acc + v * v) / n
    ) / (F2.sqrt(_sumsq(F2.col("a_env")) / n) + F2.lit(1e-9))
    return (
        cand.join(a, on="a_id")
        .join(b, on="b_id")
        .withColumn("rel_rms", rel)
        .filter(F2.col("rel_rms") <= F2.lit(max_rel_rms))
        .select("a_id", "b_id", F2.round("rel_rms", 6).alias("rel_rms"))
    )


def frame_sample(
    videos_df: DataFrame, every_k: int = 4, id_col: str = "video_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Sample every k-th frame; emit one row per sampled frame with its
    pHash — the video near-dup signature pass (frame pHash sets then feed
    the same Hamming-band dedup as still images)."""
    schema = f"{id_col} string, frame_idx int, w int, h int, frame_phash long"

    def go(batches):
        for pdf in batches:
            out = {k: [] for k in (id_col, "frame_idx", "w", "h", "frame_phash")}
            for rid, data in zip(pdf[id_col], pdf[bytes_col]):
                frames = decode_video(bytes(data))
                for idx in range(0, len(frames), every_k):
                    f = frames[idx]
                    out[id_col].append(rid)
                    out["frame_idx"].append(idx)
                    out["w"].append(f.shape[1])
                    out["h"].append(f.shape[0])
                    out["frame_phash"].append(phash64(f))
            yield pd.DataFrame(out)

    return videos_df.select(id_col, bytes_col).mapInPandas(go, schema=schema)


def video_dup_pairs(
    frames_df: DataFrame,
    id_col: str = "video_id",
    phash_col: str = "frame_phash",
    max_hamming: int = 6,
    min_frac: float = 0.5,
) -> DataFrame:
    """Video near-duplicate pairs from sampled-frame pHash sets.

    Frame-level candidates come from the SAME Manku combination-key Hamming
    join as still images (operators/dedup._hamming_band_edges) over the
    per-frame hashes that ``frame_sample`` emits; two videos match when at
    least ``min_frac`` of the SHORTER side's sampled frames have a matching
    frame in the other (frame-set containment — robust to trims and
    re-encodes).  Everything is JVM-side; payloads never appear (the frame
    table is (video_id, frame_idx, phash))."""
    from pyspark.sql import functions as F2

    from fuzzymatch_spark.operators.dedup import _hamming_band_edges

    # frame key encoding: "<frame_idx>#<video_id>".  frame_idx is digits by
    # schema, so "everything after the FIRST '#'" recovers the video id
    # unambiguously even when ids themselves contain '#' (a trailing-id
    # encoding with substring_index would silently truncate such ids).
    f = frames_df.select(
        F2.col(id_col).alias("vid"),
        F2.concat_ws("#", "frame_idx", id_col).alias("fid"),
        F2.col(phash_col).alias("ph"),
    )
    n_frames = f.groupBy("vid").agg(F2.count("*").alias("nf"))
    pairs = _hamming_band_edges(
        f.select("fid", "ph"), "fid", "ph", n_bands=8,
        max_hamming=max_hamming, source="vframe",
    )
    va = F2.expr("substring(a_id, instr(a_id, '#') + 1)")
    vb = F2.expr("substring(b_id, instr(b_id, '#') + 1)")
    cross = (
        pairs.filter(va != vb)
        .select(
            F2.least(va, vb).alias("v1"),
            F2.greatest(va, vb).alias("v2"),
            F2.when(va < vb, F2.col("a_id")).otherwise(F2.col("b_id")).alias("f1"),
            F2.when(va < vb, F2.col("b_id")).otherwise(F2.col("a_id")).alias("f2"),
        )
    )
    agg = cross.groupBy("v1", "v2").agg(
        F2.countDistinct("f1").alias("m1"), F2.countDistinct("f2").alias("m2")
    )
    n1 = n_frames.select(F2.col("vid").alias("v1"), F2.col("nf").alias("n1"))
    n2 = n_frames.select(F2.col("vid").alias("v2"), F2.col("nf").alias("n2"))
    frac = F2.when(
        F2.col("n1") <= F2.col("n2"), F2.col("m1") / F2.col("n1")
    ).otherwise(F2.col("m2") / F2.col("n2"))
    return (
        agg.join(n1, on="v1").join(n2, on="v2")
        .withColumn("matched_frac", F2.round(frac, 6))
        .filter(F2.col("matched_frac") >= F2.lit(min_frac))
        .select(F2.col("v1").alias("a_id"), F2.col("v2").alias("b_id"),
                "matched_frac")
    )


def tile_dup_pairs(
    tiles_df: DataFrame,
    n_tiles: int,
    id_col: str = "image_id",
    tile_col: str = "tile_idx",
    phash_col: str = "tile_phash",
    max_hamming: int = 2,
    min_frac: float = 0.6,
    max_bucket_size: int = 100_000,
    n_bands: int = 4,
) -> DataFrame:
    """Partial-edit-resistant image near-duplicate pairs from a per-tile
    pHash table ``(image_id, tile_idx, tile_phash)``.

    A localized edit (watermark, logo overlay, caption banner, border)
    can push the WHOLE-image pHash past any usable Hamming radius while
    leaving most of the picture untouched.  Tile containment recovers
    those pairs: two images match when at least ``min_frac`` of the grid
    positions agree within ``max_hamming`` AT THE SAME POSITION.
    Positional alignment is the point — an edit changes its own tiles
    only, so same-position agreement elsewhere is evidence, while
    cross-position matches are background (a flat banner shared by many
    edited images matches only at its own positions and stays under
    ``min_frac``; see the planted test).

    Plan shape: the same Manku combination-key decomposition as every
    other Hamming join, but bucketed on (tile position, fused band key) —
    ONE exchange of (id, hash, tile, bk) rows with in-task pair
    expansion and ``bit_count`` verify in codegen, then one small
    exchange on the pair key for the matched-tile count.  The tile table
    is digests-only (``grid² × 8`` bytes per image), so this composes
    with the payload invariant: bytes are read once by the tile UDF and
    never shuffle.  Everything below the UDF is integer SQL —
    oracle-checked from a stored tile table (``image_dedup_suite``).

    Default config (m=4 blocks, radius 2), deliberately cheaper than the
    whole-image leg's (m=8, k=6): the Manku combo count is C(m, m-k), so
    8/4 would cost 70 keys per TILE (630 band rows per image — a 22x
    heavier exchange than the whole-image join) where 4/2 costs SIX
    combos of 32-bit keys (54 band rows per image).  Same-source tiles
    are bit-identical and re-encode jitter is a few bits (measured twin
    pHash jitter <= 4 over 600 real-JPEG pairs, BENCH.md), and the
    containment threshold already tolerates a jittery minority of
    positions — a tile pushed past the radius only drops ONE of the
    >= ceil(min_frac*n) agreeing positions the pair needs.  32-bit keys
    scoped per position stay bounded at 10^12 rows (~230 members/bucket
    before the cap; the whole-image leg lives with 16-bit keys).
    ``max_bucket_size`` interacts with the threshold as a FEATURE, not a
    recall leak: flat/boilerplate tiles (white backgrounds, black bars)
    hash identically across millions of images and land in mega-buckets
    the cap drops — those positions then contribute no matches while
    the denominator stays ``n_tiles``, so a pair must reach
    ``min_frac`` through DISCRIMINATIVE positions.  Agreement on
    corpus-wide boilerplate is evidence of nothing; the cap encodes
    that (pinned by the flat-tile test).  The
    (position, band-key) pair is folded into ONE xxhash64 group column —
    the fused-key lesson from the MinHash exchange; a cross-position
    hash collision only merges buckets, and the ``a.t == b.t`` candidate
    filter keeps the output exact.  A/B + two-core-count scaling:
    `scripts/probe_tile_scale.py`.
    """
    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.dedup import hamming_band_keys

    if n_tiles < 1:
        raise ValueError(f"n_tiles must be >= 1, got {n_tiles}")
    k = min(max_hamming, n_bands - 1)
    bands = hamming_band_keys(
        tiles_df.select(
            F.col(id_col).alias("id"),
            F.col(tile_col).alias("t"),
            F.col(phash_col).alias("th"),
        ),
        "id", "th", n_bands=n_bands, max_hamming=max_hamming,
        split_band_key=False, carry_cols=["t"],
    )
    grouped = (
        bands.select(F.xxhash64("t", "bk").alias("tbk"), "id", "th", "t")
        .groupBy("tbk")
        .agg(F.collect_list(F.struct("id", "th", "t")).alias("ms"))
        .filter((F.size("ms") > 1) & (F.size("ms") <= max_bucket_size))
    )
    matched = (
        grouped.select(F.explode("ms").alias("a"), "ms")
        .select("a", F.explode("ms").alias("b"))
        .filter(F.col("a.id") < F.col("b.id"))
        .filter(F.col("a.t") == F.col("b.t"))
        .filter(
            F.bit_count(F.col("a.th").bitwiseXOR(F.col("b.th"))) <= F.lit(k)
        )
        .select(
            F.col("a.id").alias("a_id"), F.col("b.id").alias("b_id"),
            F.col("a.t").alias("t"),
        )
    )
    # countDistinct dedupes the multi-combo repeats of the same (pair, t)
    # itself (Expand + two-phase aggregate — ONE exchange); a
    # dropDuplicates first would add a second exchange for nothing
    return (
        matched.groupBy("a_id", "b_id")
        .agg(F.countDistinct("t").alias("n_matched"))
        .withColumn(
            "matched_frac",
            F.round(F.col("n_matched") / F.lit(float(n_tiles)), 6),
        )
        .filter(F.col("matched_frac") >= F.lit(min_frac))
        .select("a_id", "b_id", "matched_frac")
    )


def image_tile_dup_pairs(
    images_df: DataFrame,
    grid: int = 3,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    max_hamming: int = 2,
    min_frac: float = 0.6,
) -> DataFrame:
    """End-to-end tile-containment dedup over raw image rows: decode +
    per-tile pHash where the bytes live (``make_tile_phash_udf``), then
    the positional containment join of ``tile_dup_pairs``.  The payload
    column is consumed by the UDF at the scan and never shuffles — only
    (id, grid² longs) continues."""
    from pyspark.sql import functions as F

    from fuzzymatch_spark.sources.images import make_tile_phash_udf

    tiles = (
        images_df.select(
            F.col(id_col).alias("image_id"),
            make_tile_phash_udf(grid)(F.col(bytes_col)).alias("ths"),
        )
        .select(
            "image_id",
            F.posexplode("ths").alias("tile_idx", "tile_phash"),
        )
    )
    return tile_dup_pairs(
        tiles, n_tiles=grid * grid, max_hamming=max_hamming,
        min_frac=min_frac,
    )


def _gate_exprs(
    min_side: int,
    max_aspect: float,
    formats: tuple,
    min_caption_tokens: int,
    min_alpha_ratio: float,
    caption_col: str = "caption",
):
    """The gate's shared column expressions (aspect, caption_tokens,
    alpha_ratio, reject_reason) — one definition so the table-producing
    operator and the inline-filter form cannot drift."""
    from pyspark.sql import functions as F

    # NULL captions must take the same branch in both engines: Spark's
    # size(split(NULL)) is -1 (-> short_caption) while SQL NULL would
    # fall through every WHEN (-> keep).  Coalesce pins the convention:
    # a NULL caption is an empty caption, rejected as short_caption.
    cap = F.coalesce(F.col(caption_col), F.lit(""))
    aspect = F.round(
        F.greatest("w", "h").cast("double")
        / F.least("w", "h").cast("double"),
        6,
    )
    toks = F.size(F.filter(F.split(cap, " "), lambda x: x != F.lit("")))
    alpha = F.when(F.length(cap) == 0, F.lit(0.0)).otherwise(
        F.round(
            F.length(F.regexp_replace(cap, "[^a-zA-Z]", "")).cast("double")
            / F.length(cap).cast("double"),
            6,
        )
    )
    # NULL dims must take the same branch in both engines: greatest/
    # least IGNORE NULLs in both (least(NULL, 500) = 500), so without an
    # explicit guard a NULL-dim row is judged by its one known dim and
    # can slip through to keep.  Pin the convention: missing dims reject
    # as too_small (aspect degrades to the one-dim ratio 1.0 — identical
    # in both engines, parity-pinned by the p_nulldim planted row).
    reason = (
        F.when(
            F.col("w").isNull() | F.col("h").isNull()
            | (F.least("w", "h") < F.lit(min_side)),
            F.lit("too_small"),
        )
        .when(aspect > F.lit(max_aspect), F.lit("bad_aspect"))
        .when(~F.lower("fmt").isin(*formats), F.lit("bad_format"))
        .when(toks < F.lit(min_caption_tokens), F.lit("short_caption"))
        .when(alpha < F.lit(min_alpha_ratio), F.lit("low_alpha"))
    )
    return aspect, toks, alpha, reason


def gate_keep_predicate(
    min_side: int = 64,
    max_aspect: float = 3.0,
    formats: tuple = ("png", "jpeg"),
    min_caption_tokens: int = 3,
    min_alpha_ratio: float = 0.5,
    caption_col: str = "caption",
):
    """The gate's keep rule as a bare boolean Column, for callers that
    only need to FILTER survivors (e.g. the pipeline's stage-0 input
    cut): a `.where()` on this is a zero-shuffle scan-level predicate,
    where semi-joining against a materialized gate table would cost a
    full corpus exchange just to re-derive a deterministic function of
    the row's own metadata."""
    *_, reason = _gate_exprs(
        min_side, max_aspect, formats, min_caption_tokens,
        min_alpha_ratio, caption_col,
    )
    return reason.isNull()


def image_caption_gate(
    images_df: DataFrame,
    min_side: int = 64,
    max_aspect: float = 3.0,
    formats: tuple = ("png", "jpeg"),
    min_caption_tokens: int = 3,
    min_alpha_ratio: float = 0.5,
    id_col: str = "image_id",
) -> DataFrame:
    """LAION-style metadata curation gate over the north rule's
    image+caption table: per-row keep/reject from (w, h, fmt, caption)
    WITHOUT touching the payload bytes — the stage that runs before any
    decode so rejected rows never cost a codec pass.

    Rules, in PINNED precedence order (``reject_reason`` is the FIRST
    failing rule; NULL when kept):

    1. ``too_small``      — min(w, h) < ``min_side`` (or NULL dims)
    2. ``bad_aspect``     — max(w,h)/min(w,h) > ``max_aspect``
    3. ``bad_format``     — lower(fmt) not in ``formats`` (lowercase)
    4. ``short_caption``  — non-empty-token count < ``min_caption_tokens``
    5. ``low_alpha``      — [a-zA-Z] fraction of caption < ``min_alpha_ratio``

    Everything is a portable column expression (single-space
    tokenization, Java/RE2-common regex, round-6dp ratios, zero-length
    guards) so the driver oracle reproduces it bit-for-bit in DuckDB.
    Scale shape: one projection, zero shuffles, zero Python — runs at
    scan speed and prunes to metadata columns only.
    """
    from pyspark.sql import functions as F

    aspect, toks, alpha, reason = _gate_exprs(
        min_side, max_aspect, formats, min_caption_tokens, min_alpha_ratio
    )
    return images_df.select(
        F.col(id_col).alias("image_id"),
        F.col("w"),
        F.col("h"),
        F.col("fmt"),
        aspect.alias("aspect"),
        toks.alias("caption_tokens"),
        alpha.alias("alpha_ratio"),
        reason.alias("reject_reason"),
        reason.isNull().alias("keep"),
    )


def mirror_dup_pairs(
    images_df: DataFrame,
    cfg,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
) -> DataFrame:
    """Flip/rotation-resistant image near-duplicate pairs: dihedral-
    canonical pHash (``phash64_canonical`` — exactly invariant under the
    8 symmetries of the square) computed where the bytes live, then the
    UNCHANGED banded Hamming join (``phash_band_edges``).

    Mirrored re-posts are a real dup class the plain pHash misses —
    ``fliplr`` negates every odd-column DCT coefficient, pushing ~half
    the sign block past any usable radius (asserted in the planted
    test), while the canonical hash restores the pair to Hamming 0.
    Same plan shape and scale story as the primary pHash leg: only
    (id, long) rides the exchange; payloads never shuffle.

    Capacity note for extreme scale: a canonical hash is the min over 8
    per-transform hashes, so the pairwise background near-collision rate
    at equal radius is up to ~8x8 = 64x the plain leg's (any of A's 8
    transform hashes can sit near any of B's).  True mirrored dups are
    at canonical Hamming ~0, so when background volume matters tighten
    ``cfg.phash_max_hamming`` for this leg (radius 2-3 keeps re-encoded
    mirrors; the tier-2 dHash verify can NOT back this leg up — dHash is
    not mirror-invariant).
    """
    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.dedup import phash_band_edges
    from fuzzymatch_spark.sources.images import make_canonical_phash_udf

    hashes = images_df.select(
        F.col(id_col).alias("image_id"),
        make_canonical_phash_udf()(F.col(bytes_col)).alias("cphash"),
    )
    return phash_band_edges(hashes, cfg, phash_col="cphash")


def image_dedup_edges(
    images_df: DataFrame,
    cfg,
    id_col: str = "image_id",
    bytes_col: str = "bytes",
    grid: int = 3,
    tile_max_hamming: int = 2,
    tile_min_frac: float = 0.6,
    mirror_max_hamming: int = 4,
) -> DataFrame:
    """The full image near-dup candidate surface from ONE decode per
    image: fused digests (``make_image_digests_udf``) feed every leg —

    * ``phash``  — banded Hamming join on the whole-image pHash with the
      tier-2 independent-dHash verify riding the bucket struct
      (re-encode twins; diffuse background killed by the second digest)
    * ``mirror`` — the same join on the dihedral-canonical pHash
      (flipped/rotated re-posts, canonical Hamming 0)
    * ``tiles``  — positional tile containment (localized edits:
      watermark / banner / border)

    Returns distinct (a_id, b_id, source) edges ready for the verify /
    clustering stages.  The digest table persists LAZILY so the decode
    UDF evaluates once across the three branches (the decontaminate_fuzzy
    lesson — uncached lineage re-runs the UDF per branch); payloads are
    consumed at the scan and never shuffle.  A pair found by several
    legs appears once per source — source multiplicity is evidence the
    caller may weigh, so it is not collapsed here.
    """
    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.dedup import phash_band_edges
    from fuzzymatch_spark.sources.images import make_image_digests_udf

    dig = (
        images_df.select(
            F.col(id_col).alias("image_id"),
            make_image_digests_udf(grid)(F.col(bytes_col)).alias("d"),
        )
        .select(
            "image_id",
            F.col("d.phash").alias("phash"),
            F.col("d.dhash").alias("dhash"),
            F.col("d.cphash").alias("cphash"),
            F.col("d.tiles").alias("tiles"),
        )
        .persist()
    )
    ham = phash_band_edges(dig, cfg, phash_col="phash", verify_col="dhash")
    # tighter radius for the canonical leg: min-of-8 hashes carry up to
    # ~64x the background near-collision rate at equal radius (see
    # mirror_dup_pairs), while true mirrors sit at canonical Hamming
    # ~0-4 (re-encode jitter) — and dHash cannot verify this leg
    import dataclasses

    mcfg = dataclasses.replace(cfg, phash_max_hamming=mirror_max_hamming)
    mir = phash_band_edges(dig, mcfg, phash_col="cphash", source="mirror")
    tiles = dig.select(
        "image_id", F.posexplode("tiles").alias("tile_idx", "tile_phash")
    )
    tl = tile_dup_pairs(
        tiles, n_tiles=grid * grid, max_hamming=tile_max_hamming,
        min_frac=tile_min_frac,
    ).select("a_id", "b_id", F.lit("tiles").alias("source"))
    return (
        ham.select("a_id", "b_id", "source")
        .unionByName(mir.select("a_id", "b_id", "source"))
        .unionByName(tl)
        .dropDuplicates(["a_id", "b_id", "source"])
    )


def shot_boundaries(
    frames: DataFrame,
    vid_col: str = "video_id",
    idx_col: str = "frame_idx",
    phash_col: str = "frame_phash",
    max_hamming: int = 16,
) -> DataFrame:
    """Shot/scene segmentation over a STORED per-frame perceptual-hash
    table: a new shot starts wherever consecutive frames differ by more
    than ``max_hamming`` bits (the classic hash-difference shot-boundary
    detector; within a shot consecutive pHashes move a few bits, a cut
    jumps ~half the bits).  Segmenting videos into shots is the standard
    precursor to per-shot keyframe sampling for training-data pipelines
    — sample one frame per SHOT, not per N frames, and a slideshow
    doesn't flood the corpus with near-identical keyframes.

    Pure window arithmetic on the compact digests: one exchange
    partitioned by video id (frames of a video are processed together —
    the same layout the frame table is already written in), ``lag`` +
    ``bit_count(xor)`` per frame in whole-stage codegen, a running sum
    for shot ids, one aggregate.  Payload bytes are never touched.

    Returns (``vid_col``, shot_id, start_idx, end_idx, n_frames) with
    shot_id numbered from 1 per video in frame order.
    """
    from pyspark.sql import Window, functions as F

    w = Window.partitionBy(vid_col).orderBy(idx_col)
    prev = F.lag(phash_col).over(w)
    dist = F.bit_count(
        F.col(phash_col).bitwiseXOR(prev)
    )
    is_boundary = F.when(
        prev.isNull() | (dist > int(max_hamming)), 1
    ).otherwise(0)
    cum = Window.partitionBy(vid_col).orderBy(idx_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        frames.withColumn("_b", is_boundary)
        .withColumn("shot_id", F.sum("_b").over(cum).cast("long"))
        .groupBy(vid_col, "shot_id")
        .agg(
            F.min(idx_col).cast("long").alias("start_idx"),
            F.max(idx_col).cast("long").alias("end_idx"),
            F.count("*").cast("long").alias("n_frames"),
            # the per-shot sampling contract: one representative frame
            # per shot — the middle EXISTING index (frame tables may be
            # sparse/sampled, so the arithmetic midpoint need not be a
            # real frame; this always joins back to the frame table)
            F.element_at(
                F.array_sort(F.collect_list(F.col(idx_col))),
                ((F.count("*") + 1) / 2).cast("int"),
            )
            .cast("long")
            .alias("keyframe_idx"),
        )
    )


def audio_segments(
    clips_df: DataFrame,
    id_col: str = "clip_id",
    env_col: str = "envelope",
    threshold: float = 0.2,
) -> DataFrame:
    """Active-segment / silence statistics over the stored RMS-envelope
    digest — the audio analog of video shot segmentation: silence-split
    segments are the natural units for per-segment sampling and for
    dropping silent/near-silent clips from a training corpus.

    A frame is ACTIVE when its envelope RMS >= ``threshold``; segments
    are maximal runs of active frames.  Computed as ONE ``aggregate``
    fold over the envelope array — within-row, whole-stage codegen, zero
    shuffle, audio bytes never touched (the digest was computed where
    the bytes live, ``sources/audio.py``).

    Returns (``id_col``, n_frames, n_active, n_segments, longest_run,
    active_frac) per clip.
    """
    from pyspark.sql import functions as F2

    thr = float(threshold)
    init = F2.struct(
        F2.lit(0).alias("run"),
        F2.lit(0).alias("best"),
        F2.lit(0).alias("segs"),
        F2.lit(0).alias("act"),
    )

    def step(acc, v):
        a = v.cast("double") >= thr
        run = F2.when(a, acc["run"] + 1).otherwise(F2.lit(0))
        return F2.struct(
            run.alias("run"),
            F2.greatest(acc["best"], run).alias("best"),
            (
                acc["segs"]
                + F2.when(a & (acc["run"] == 0), 1).otherwise(0)
            ).alias("segs"),
            (acc["act"] + a.cast("int")).alias("act"),
        )

    agg = F2.aggregate(F2.col(env_col), init, step)
    n = F2.size(F2.col(env_col))
    return clips_df.select(
        F2.col(id_col),
        n.cast("long").alias("n_frames"),
        agg["act"].cast("long").alias("n_active"),
        agg["segs"].cast("long").alias("n_segments"),
        agg["best"].cast("long").alias("longest_run"),
        F2.round(
            agg["act"] / F2.greatest(n, F2.lit(1)), 6
        ).alias("active_frac"),
    )


# SDXL-style aspect ladder: every (w, h) is a multiple of 64 with area
# <= 1024^2, symmetric around square — the shape a latent-diffusion
# training pipeline bins resolutions into so batches share a tensor
# shape without destructive center-crops.
DEFAULT_ASPECT_BUCKETS: tuple = (
    (512, 2048), (576, 1792), (640, 1600), (704, 1408), (768, 1344),
    (832, 1216), (896, 1152), (960, 1088), (1024, 1024), (1088, 960),
    (1152, 896), (1216, 832), (1344, 768), (1408, 704), (1600, 640),
    (1792, 576), (2048, 512),
)


def aspect_buckets(
    images_df: DataFrame,
    buckets: tuple = DEFAULT_ASPECT_BUCKETS,
    w_col: str = "w",
    h_col: str = "h",
) -> DataFrame:
    """Aspect-ratio bucketing for image training batches: assign each
    image the ladder bucket whose aspect is nearest its own, and emit
    the bucket's target dims plus whether reaching them is a downscale.

    Nearness is the scale-free RATIO distance ``max(a/b, b/a)`` (the
    exp of |log-aspect| distance — same argmin, but built purely from
    IEEE divisions so Spark and the DuckDB oracle agree bit-for-bit
    where ``log`` implementations might not); ties break toward the
    lower bucket index.  Precondition: positive ``w``/``h`` (run the
    metadata gate first — rejected rows never reach the bucketer).

    Scale shape: the ladder is a constant-folded literal array and the
    argmin is ``array_min`` over lexicographically-ordered structs —
    one projection, zero shuffles, zero Python, runs at scan speed on
    metadata columns only (payload bytes never touched).
    """
    from pyspark.sql import functions as F2

    if not buckets:
        raise ValueError("buckets must be a non-empty ladder")
    a = F2.col(w_col).cast("double") / F2.col(h_col).cast("double")
    entries = []
    for i, (bw, bh) in enumerate(buckets):
        b = F2.lit(bw / bh)
        entries.append(
            F2.struct(
                F2.greatest(a / b, b / a).alias("d"),
                F2.lit(i).alias("i"),
                F2.lit(int(bw)).alias("bw"),
                F2.lit(int(bh)).alias("bh"),
            )
        )
    best = F2.array_min(F2.array(*entries))
    return (
        images_df.withColumn("bucket_w", best["bw"])
        .withColumn("bucket_h", best["bh"])
        .withColumn(
            "downscale",
            (
                F2.col(w_col).cast("long") * F2.col(h_col).cast("long")
                > best["bw"].cast("long") * best["bh"].cast("long")
            ).cast("int"),
        )
    )


def canonical_image_selection(
    labels_df: DataFrame,
    id_col: str = "image_id",
    cluster_col: str = "cluster_id",
    pixels_col: str = "pixels",
) -> DataFrame:
    """Survivor selection, image flavor: within each dedup cluster flag
    the highest-RESOLUTION member (max ``pixels``, ties by min id) as
    canonical — the copy a training pipeline keeps when near-dups span
    thumbnails and originals.  Text-side selection keeps min id
    (`operators/cluster.py:canonical_corpus`); images rank by quality.

    Scale shape: per-cluster argmin of a ``(−pixels, id)`` struct via
    ``groupBy().agg(min(...))`` — partial aggregation combines map-side,
    so a near-dup storm (one mega-cluster holding millions of members)
    never serializes into the single partition-task a window over
    ``cluster_id`` would; the winner table (one row per cluster) joins
    back on the same key, where AQE's skew-join splits any hot label.
    Grain preserved: output = input + ``is_canonical`` int.
    """
    from pyspark.sql import functions as F2

    winners = (
        labels_df.groupBy(cluster_col)
        .agg(
            F2.min(
                F2.struct(
                    (-F2.col(pixels_col)).alias("np"),
                    F2.col(id_col).alias("wid"),
                )
            ).alias("_w")
        )
        .select(cluster_col, F2.col("_w.wid").alias("_winner"))
    )
    return (
        labels_df.join(winners, cluster_col)
        .withColumn(
            "is_canonical",
            (F2.col(id_col) == F2.col("_winner")).cast("int"),
        )
        .drop("_winner")
    )


def bucket_batches(
    images_df: DataFrame,
    batch_size: int,
    n_shards: int = 1024,
    id_col: str = "image_id",
    bucket_cols: tuple = ("bucket_w", "bucket_h"),
) -> DataFrame:
    """Deterministic micro-batch assignment over the gate survivors:
    within each (aspect bucket, shard) every row gets a stable
    ``batch_idx`` — consecutive ``batch_size``-row groups in id order —
    so a training loader reads same-tensor-shape batches straight off
    the table with no runtime shuffling, and re-runs assign identical
    batches (the property a ``rand()``-based batcher lacks).

    The shard is the id's md5 fingerprint mod ``n_shards`` (the engine's
    oracle-portable hash — stable under corpus growth like the hash
    train/val/test splits).  Scale shape: the window partitions on
    (bucket, shard), so no partition exceeds ~|kept| / (buckets *
    n_shards) rows — batches form within shards exactly as a
    per-worker distributed loader would, and a 17-bucket ladder never
    collapses 10^12 rows into 17 global sorts.  Size ``n_shards`` to
    your executor count, not to the corpus.
    """
    from pyspark.sql import functions as F2
    from pyspark.sql.window import Window

    from fuzzymatch_spark.operators.textstats import md5_fingerprint64

    if batch_size < 1:
        raise ValueError(f"batch_size must be >= 1, got {batch_size}")
    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F2.pmod(
        md5_fingerprint64(F2.col(id_col).cast("string")), F2.lit(n_shards)
    ).cast("int")
    out = images_df.withColumn("shard", shard)
    w = Window.partitionBy(*bucket_cols, "shard").orderBy(id_col)
    rn = F2.row_number().over(w) - F2.lit(1)
    # exact integer division: (rn - rn % b) / b divides evenly, so the
    # double quotient is an exact integer (no float-boundary risk)
    return out.withColumn(
        "batch_idx",
        (
            (rn - F2.pmod(rn, F2.lit(batch_size))) / F2.lit(batch_size)
        ).cast("long"),
    )


def resize_to_buckets(
    images_df: DataFrame,
    buckets: tuple = DEFAULT_ASPECT_BUCKETS,
) -> DataFrame:
    """Resize every image to its aspect bucket's target dims — the
    payload half of aspect bucketing: after this pass every image in a
    bucket shares a tensor shape, so training batches stack without
    runtime crops or pad waste.

    The bucket is recomputed INLINE from the (w, h) metadata riding the
    row (the same ratio-distance argmin `aspect_buckets` pins
    cross-engine) rather than joined from a manifest table: a join
    would shuffle the corpus — payload bytes included — to deliver two
    small ints that are a deterministic function of columns already in
    the row.  Plan shape: one projection + one Arrow-batched
    ``mapInPandas`` codec pass where the bytes live; zero exchanges.

    Area-average resample (`_resize_rect`, exact integral-image box
    means), PNG output (lossless, so the resampled pixels round-trip
    exactly).  Returns (image_id, bytes, w, h, fmt) at bucket geometry.
    """
    from pyspark.sql import functions as F2

    schema = "image_id string, bytes binary, w int, h int, fmt string"
    from fuzzymatch_spark.kernels.phash import _resize_rect

    def go(batches):
        for pdf in batches:
            out = {k: [] for k in ("image_id", "bytes", "w", "h", "fmt")}
            for rid, data, bw, bh in zip(
                pdf["image_id"], pdf["bytes"],
                pdf["bucket_w"], pdf["bucket_h"],
            ):
                px = decode_image(bytes(data))
                small = np.clip(
                    np.rint(_resize_rect(px, int(bh), int(bw))), 0, 255
                ).astype(np.uint8)
                out["image_id"].append(rid)
                out["bytes"].append(encode_image(small, "png"))
                out["w"].append(int(bw))
                out["h"].append(int(bh))
                out["fmt"].append("png")
            yield pd.DataFrame(out)

    return (
        aspect_buckets(images_df, buckets=buckets)
        .select("image_id", "bytes", "bucket_w", "bucket_h")
        .mapInPandas(go, schema=schema)
    )


def survivor_payload_filter(
    images_df: DataFrame,
    drop_ids_df: DataFrame,
    id_col: str = "image_id",
    bits_per_id: int = 10,
    delivery: str = "bloom",
) -> DataFrame:
    """Filter a payload table down to dedup survivors WITHOUT shuffling
    the bytes — the delivery problem for any per-row verdict that is
    *not* a function of the row's own columns (the canonical flag
    depends on clustering, so — unlike the metadata gate — it cannot be
    recomputed inline at the scan).

    A plain semi/anti join against the drop set sort-merge-joins at
    production sizes, exchanging every payload row on id.  Instead the
    drop verdict travels as a Bloom filter (``functions/bloom.py``) and
    only false positives ride a join — as bare ids:

    1. **Bloom over the DROP ids** (non-survivors), broadcast as ONE
       packed ``binary`` plan literal (a per-element ``array<long>``
       literal is ~78k py4j calls + a 78k-node plan per action at 5M
       bits — measured 20x slower and driver-bound; see
       ``functions/bloom.py``).  Rows whose id misses the filter are
       DEFINITE survivors and pass at scan speed.
    2. **False-positive recovery, ids only.**  Survivors that hit the
       filter (~``0.6185**bits_per_id`` of them) are recovered by
       anti-joining the *id column alone* against the drop set, then
       broadcast back; the final keep predicate is ``NOT bloom_hit OR
       fp``, evaluated where the bytes live.  Output is EXACT — every
       id not in ``drop_ids_df`` survives, bit-for-bit.

    Scale shape: broadcast O(|drops| * bits_per_id / 8) for the filter
    plus O(fp_rate * |survivors|) recovered ids; the ids-only anti-join
    exchanges O(fp_rate * |survivors| + |drops|) ids.  Payload bytes
    never enter an Exchange (plan-gated).  When even the drop set's
    Bloom outgrows the broadcast budget (~10^10 drops at 10 bits/id is
    ~12 GB), use ``survivor_payload_filter_sharded`` — hash-aligned
    shards re-bound each pass's filter — rather than falling back to
    the payload shuffle.

    Measured crossover (``scripts/probe_payload_emit.py``, BENCH.md):
    with a 25% drop rate over 2M rows the plain anti-join WINS at 512 B
    bodies (~1 GB exchange, 2.2 s vs 4.2 s — the Bloom path is bound by
    its two fixed ids-only jobs) and LOSES at 4 KiB bodies (~8 GB
    exchange, 13.0 s vs 7.1 s at 8 cores).  ``delivery`` makes the
    choice explicit: ``"bloom"`` (default — the at-scale shape) or
    ``"anti_join"`` (the small-corpus fast path: one plain ``left_anti``
    join, payload rides the exchange).  Output is identical either way;
    the caller picks on the exchange-vs-fixed-cost regime, which depends
    on deployment scale the engine cannot see from local statistics.

    ``drop_ids_df`` must carry ``id_col``; ids must be non-null.
    """
    from pyspark.sql import functions as F2

    from fuzzymatch_spark.functions.bloom import (
        bloom_build,
        bloom_might_contain,
        bloom_params,
    )

    if delivery not in ("bloom", "anti_join"):
        raise ValueError(f"delivery must be 'bloom' or 'anti_join': {delivery!r}")
    drops = drop_ids_df.select(id_col)
    if delivery == "anti_join":
        return images_df.join(drops, id_col, "left_anti")
    n_drops = drops.count()
    if n_drops == 0:
        return images_df
    n_bits, k = bloom_params(n_drops, bits_per_id)
    bf = bloom_build(drops, F2.col(id_col), n_bits, k)
    hit = bloom_might_contain(bf, F2.col(id_col), n_bits, k)

    # ids-only: bloom-hit ids that are NOT real drops (false positives)
    fp_keep = (
        images_df.select(id_col)
        .filter(hit)
        .join(drops, id_col, "left_anti")
        .withColumn("_fp", F2.lit(1))
    )
    return (
        images_df.join(F2.broadcast(fp_keep), id_col, "left")
        .filter(~hit | F2.col("_fp").isNotNull())
        .drop("_fp")
    )


def decontaminate_images(
    corpus_df: DataFrame,
    bench_df: DataFrame,
    corpus_id: str = "image_id",
    bench_id: str = "bench_id",
    phash_col: str = "phash",
    max_hamming: int = 6,
    n_bands: int = 8,
) -> DataFrame:
    """Image decontamination: flag every corpus image whose perceptual
    hash is within ``max_hamming`` of ANY benchmark/eval image — the
    image flavor of the text pipeline's benchmark decontamination
    (`operators/corpus.py:decontaminate_ngrams` / `decontaminate_fuzzy`).
    Training on eval near-dups (re-encodes, resizes — exactly what a
    small pHash radius captures) silently inflates benchmark scores, so
    at curation time the corpus is screened against the eval set.

    Shape (mirrors the text tiers: the corpus NEVER shuffles):

    1. Both sides decompose into Manku combination band keys
       (`operators/dedup.py:hamming_band_keys`, the same fused single-
       int64 keys as the self-join legs) — recall-complete by
       pigeonhole at C(m, m-k), bit-exact verify after.
    2. The benchmark side (small by construction: eval sets are 1e3-1e6
       rows vs a 1e12 corpus) is explicitly ``broadcast()``; corpus band
       keys are produced in-task from the stored hash column, so the
       only rows that ever reach an Exchange are MATCHED candidates
       (bounded by contamination volume), not the corpus.
    3. Exact ``bit_count`` verify, distinct per (corpus, bench) pair
       (a near pair matches through several combos), then per-corpus-id
       hit stats broadcast back onto the full corpus grain.

    Returns ``corpus_df`` + ``n_bench_hits`` (distinct benchmark images
    within the radius), ``min_hamming`` (NULL for clean rows), and
    ``contaminated`` (int 0/1).  Hashes must be non-null int64.

    The hash column is generic (like the streaming sink's): pass
    ``phash_col="cphash"`` with stored dihedral-canonical hashes
    (``make_canonical_phash_udf``) and the same screen catches FLIPPED /
    ROTATED re-posts of eval images that the plain pHash misses.
    """
    from pyspark.sql import functions as F2

    from fuzzymatch_spark.operators.dedup import hamming_band_keys

    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    if max_hamming >= n_bands:
        # hamming_band_keys silently clamps k to n_bands-1: a radius >=
        # n_bands would MISS pairs whose differing bits touch every band
        # while this docstring promises pigeonhole recall-completeness —
        # refuse instead of silently losing recall in a safety screen
        raise ValueError(
            f"max_hamming ({max_hamming}) must be < n_bands ({n_bands}) "
            "for recall-complete banding; raise n_bands instead"
        )
    # hamming_band_keys normalizes its id column to "id" in the output
    bench_keys = hamming_band_keys(
        bench_df.select(bench_id, phash_col),
        bench_id, phash_col, n_bands, max_hamming, split_band_key=False,
    ).select(
        F2.col("id").alias("_bid"),
        F2.col(phash_col).alias("_bhash"),
        "bk",
    )
    corpus_keys = hamming_band_keys(
        corpus_df.select(corpus_id, phash_col),
        corpus_id, phash_col, n_bands, max_hamming, split_band_key=False,
    ).select(F2.col("id").alias(corpus_id), phash_col, "bk")
    dist = F2.bit_count(F2.col(phash_col).bitwiseXOR(F2.col("_bhash")))
    hits = (
        corpus_keys.join(F2.broadcast(bench_keys), "bk")
        .filter(dist <= F2.lit(max_hamming))
        .select(corpus_id, "_bid", dist.alias("_d"))
        .distinct()
        .groupBy(corpus_id)
        .agg(
            F2.count(F2.lit(1)).cast("long").alias("n_bench_hits"),
            F2.min("_d").cast("int").alias("min_hamming"),
        )
    )
    return (
        corpus_df.join(F2.broadcast(hits), corpus_id, "left")
        .withColumn(
            "n_bench_hits", F2.coalesce("n_bench_hits", F2.lit(0).cast("long"))
        )
        .withColumn(
            "contaminated", (F2.col("n_bench_hits") > 0).cast("int")
        )
    )


def survivor_payload_filter_sharded(
    images_df: DataFrame,
    drop_ids_df: DataFrame,
    n_shards: int,
    id_col: str = "image_id",
    bits_per_id: int = 10,
) -> DataFrame:
    """`survivor_payload_filter` for drop sets whose Bloom outgrows the
    broadcast budget (~10^10 drops at 10 bits/id is ~12 GB of filter):
    split the id space into ``n_shards`` hash-aligned shards and run the
    Bloom pass per shard.

    The alignment is the whole trick: shard ``s`` of the PAYLOAD can
    only be dropped by ids in shard ``s`` of the DROP set (same
    ``pmod(xxhash64(id), n_shards)`` on both sides), so each pass
    builds a filter over |drops|/n_shards ids — pick ``n_shards`` to
    bring that under the broadcast budget.  Each shard's plan is
    exactly the single-shard operator's (payload scanned once per
    shard with the shard predicate pushed to the scan, bytes never in
    an Exchange); the union of shard outputs is EXACTLY the unsharded
    output, pinned by test.

    Cost: ``n_shards`` sequential passes (one Bloom build + one
    fp-recovery job each) and n_shards scans of the payload source —
    each scan reading ~1/n_shards of the rows after the pushed shard
    filter (with parquet the filter prunes row groups only as well as
    ids cluster; hive-partitioning the payload by the same shard key
    makes it exact partition pruning).  Driver-side loop, executor-side
    data — nothing here collects payloads.
    """
    from pyspark.sql import functions as F2

    if n_shards < 1:
        raise ValueError(f"n_shards must be >= 1, got {n_shards}")
    shard = F2.pmod(F2.xxhash64(F2.col(id_col)), F2.lit(n_shards))
    out = None
    for s in range(n_shards):
        part = survivor_payload_filter(
            images_df.where(shard == s),
            drop_ids_df.where(shard == s),
            id_col=id_col,
            bits_per_id=bits_per_id,
        )
        out = part if out is None else out.unionByName(part)
    return out
