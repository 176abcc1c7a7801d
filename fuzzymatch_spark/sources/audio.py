"""Synthetic audio source + codec plumbing (audio modality).

CODEC STATUS (REAL since late r6): ``encode_audio`` writes standard
RIFF/WAVE PCM (16-bit mono little-endian — the universal uncompressed
format; any player, ffmpeg, librosa, or Python's stdlib ``wave`` module
reads it) and ``decode_audio`` parses any 16-bit PCM mono WAV, not just
its own output.  Lossless by construction (decoded samples are
byte-exact); the stdlib-``wave`` cross-check in tests/test_audio.py
pins conformance in both directions.  The legacy FAUD stand-in
container still decodes (pre-r6 stored fixtures); compressed codecs
(MP3/AAC/FLAC) would go through ffmpeg/libsndfile in production and
raise loudly here.  Everything Spark-side — binary column schema,
mapInPandas batch shape, the fingerprint UDF, Hamming-band dedup — is
real and tested.

The per-clip fingerprint is a 64-bit random-hyperplane sketch of a
continuous 128-dim band-energy TRAJECTORY descriptor:
  frame the PCM (2048-sample windows, hop 1024) -> magnitude spectrum
  (numpy rFFT) -> 16 log-spaced band energies -> log1p, averaged around 8
  time anchors (8 x 16 = 128 dims) -> z-score (centering spreads vector
  directions; raw log-energies are all-positive and would all sketch
  alike) -> sign of 64 fixed random projections -> 64-bit clip signature.
Near-identical audio (re-encode, mild noise, small gain) flips only a few
projection signs (measured Hamming <= 2 vs >= 3 for unrelated clips), so
clips dedup with the SAME Manku combination-key band join as images
(operators/dedup._hamming_band_edges).

Alongside the fingerprint, ``build_audio_df`` emits a compact ``envelope``
digest (per-segment RMS, 64 float32) computed where the bytes live — the
verify tier compares envelopes JVM-side, so audio payloads never ride a
shuffle (same discipline as the image stage's build_phash_df).
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
from fuzzymatch_spark.plans.parallelism import ensure_min_partitions

_MAGIC_AUD = b"FAUD"


def encode_audio(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode mono int16 PCM to a standard RIFF/WAVE file (fmt chunk:
    PCM, 1 channel, 16-bit; data chunk: little-endian samples)."""
    s = np.asarray(samples, dtype="<i2")
    pcm = s.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, rate, byte rate, block align, bits
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
        + (b"\x00" if len(pcm) % 2 else b"")  # RIFF chunks are word-aligned
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_audio(data: bytes) -> tuple[np.ndarray, int]:
    """Decode to (int16 samples, sample_rate).  Accepts any 16-bit PCM
    mono RIFF/WAVE file (chunk-walks, so extra chunks like LIST/INFO are
    skipped); the legacy FAUD stand-in container still decodes."""
    if data[:4] == _MAGIC_AUD:  # pre-r6 stored fixtures
        sr, n = struct.unpack("<II", data[4:12])
        pcm = np.frombuffer(zlib.decompress(data[12:]), dtype=np.int16)
        return pcm[:n], sr
    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise NotImplementedError(
            "unknown audio container (WAV decodes natively; compressed"
            " codecs need ffmpeg/libsndfile)"
        )
    i = 12
    sr = None
    pcm = None
    while i + 8 <= len(data):
        cid = data[i : i + 4]
        ln = struct.unpack("<I", data[i + 4 : i + 8])[0]
        body = data[i + 8 : i + 8 + ln]
        if cid == b"fmt ":
            tag, ch, sr, _br, _ba, bits = struct.unpack("<HHIIHH", body[:16])
            if tag != 1 or ch != 1 or bits != 16:
                raise NotImplementedError(
                    "only 16-bit PCM mono WAV decodes natively"
                )
        elif cid == b"data":
            pcm = np.frombuffer(body[: ln - (ln % 2)], dtype="<i2")
        i += 8 + ln + (ln % 2)  # chunks are word-aligned
    if sr is None or pcm is None:
        raise ValueError("WAV missing fmt or data chunk")
    return pcm, sr


def synth_samples(
    clip_id: str, seconds: float = 1.0, sample_rate: int = 16_000
) -> np.ndarray:
    """Deterministic per-id audio: a few seeded sinusoids + mild noise, so
    the band-energy fingerprint is meaningful and stable."""
    seed = int.from_bytes(
        hashlib.blake2b(clip_id.encode(), digest_size=4).digest(), "little"
    )
    rng = np.random.RandomState(seed)
    n = int(seconds * sample_rate)
    t = np.arange(n) / sample_rate
    x = np.zeros(n)
    for _ in range(4):
        f = rng.uniform(80.0, 4000.0)
        a = rng.uniform(0.1, 0.3)
        x += a * np.sin(2 * np.pi * f * t + rng.uniform(0, 2 * np.pi))
    # slow amplitude envelope makes band energies time-varying
    x *= 0.6 + 0.4 * np.sin(2 * np.pi * rng.uniform(0.5, 3.0) * t)
    x += rng.normal(0, 0.01, n)
    return np.clip(x * 12_000, -32_000, 32_000).astype(np.int16)


_N_BANDS = 16
_FRAME = 2048
_HOP = 1024
_BIT_IDX = np.arange(64, dtype=np.uint64)


def _band_energies(pcm: np.ndarray, sample_rate: int) -> np.ndarray:
    """(n_frames, _N_BANDS) log-band magnitudes via numpy rFFT."""
    x = pcm.astype(np.float64) / 32768.0
    n = len(x)
    if n < _FRAME:
        x = np.pad(x, (0, _FRAME - n))
        n = _FRAME
    n_frames = 1 + (n - _FRAME) // _HOP
    idx = np.arange(_FRAME)[None, :] + _HOP * np.arange(n_frames)[:, None]
    frames = x[idx] * np.hanning(_FRAME)[None, :]
    mag = np.abs(np.fft.rfft(frames, axis=1))
    # log-spaced band edges between ~60 Hz and Nyquist
    freqs = np.fft.rfftfreq(_FRAME, 1.0 / sample_rate)
    edges = np.geomspace(60.0, sample_rate / 2.0, _N_BANDS + 1)
    bands = np.zeros((n_frames, _N_BANDS))
    for b in range(_N_BANDS):
        sel = (freqs >= edges[b]) & (freqs < edges[b + 1])
        if sel.any():
            bands[:, b] = (mag[:, sel] ** 2).sum(axis=1)
    return bands


def clip_features(pcm: np.ndarray, sample_rate: int) -> np.ndarray:
    """Continuous 128-dim clip descriptor: the log band-energy trajectory
    at 8 time anchors x 16 bands, z-scored and L2-normalized.  Continuous
    features make the sketch noise-robust: a mild perturbation moves the
    vector slightly instead of rerolling discrete codes (the failure mode
    of hashing exact per-frame bit patterns)."""
    e = _band_energies(pcm, sample_rate)
    loge = np.log1p(e)
    # band-energy TRAJECTORY at 8 time anchors (8 x 16 = 128 dims): two
    # clips sharing band occupancy still differ in envelope shape, and the
    # anchors average a small window so mild sample noise barely moves them
    k = 8
    t = loge.shape[0]
    anchors = np.linspace(0, max(t - 1, 0), k).astype(int)
    win = max(1, t // (2 * k))
    traj = np.stack(
        [loge[max(a - win, 0) : a + win + 1].mean(axis=0) for a in anchors]
    ).ravel()
    # z-score: raw log-energies are all-positive, so un-centered vectors
    # share a common direction and EVERY clip pair sketches within a small
    # Hamming distance — centering spreads directions so only genuinely
    # similar spectra collide
    s = traj.std()
    feat = (traj - traj.mean()) / s if s > 0 else traj - traj.mean()
    nrm = np.linalg.norm(feat)
    return feat / nrm if nrm > 0 else feat


_ENV_SEGS = 64


def rms_envelope(pcm: np.ndarray, n_segs: int = _ENV_SEGS) -> np.ndarray:
    """Compact signal digest: RMS over ``n_segs`` equal slices of the clip
    (float32).  This is the VERIFY column — near-identical signals (noise,
    re-encode, small gain) keep relative envelope error ~1e-3 while
    unrelated clips differ at O(1), and comparing 64 floats JVM-side means
    the verify join never touches audio bytes."""
    x = pcm.astype(np.float64)
    n = len(x)
    if n == 0:
        return np.zeros(n_segs, dtype=np.float32)
    edges = (np.arange(n_segs + 1) * n) // n_segs
    csum = np.concatenate(([0.0], np.cumsum(x * x)))
    seg_sq = csum[edges[1:]] - csum[edges[:-1]]
    cnt = np.maximum(np.diff(edges), 1)
    return np.sqrt(seg_sq / cnt).astype(np.float32)


_AUDIO_PLANES = np.random.RandomState(4242).normal(size=(128, 64))


def audio_fingerprint64(pcm: np.ndarray, sample_rate: int) -> int:
    """64-bit clip signature: random-hyperplane sketch of the continuous
    band-energy descriptor — stable under re-encode / mild noise (few
    projection signs flip), Hamming-comparable across clips."""
    feat = clip_features(pcm, sample_rate)
    bits = (feat @ _AUDIO_PLANES) > 0
    out = int((bits.astype(np.uint64) << _BIT_IDX).sum())
    return out - (1 << 64) if out >= (1 << 63) else out


def build_audio_df(
    spark,
    docs_df,
    id_col: str = "doc_id",
    dup_fraction: float = 0.25,
    seed: int = 42,
):
    """audio table synthesized deterministically from a documents table:
    (clip_id, bytes, sample_rate, n_samples, fingerprint, envelope); a
    seeded fraction of rows get a near-dup twin (same signal + mild noise +
    re-encode) — the planted positives for the fingerprint Hamming stage.
    Fingerprint AND the envelope verify digest are computed where the bytes
    live; payloads never cross into any shuffle (same discipline as the
    image stage)."""
    import pandas as pd

    schema = (
        "clip_id string, bytes binary, sample_rate int, n_samples int, "
        "fingerprint long, envelope array<float>"
    )
    docs_df = ensure_min_partitions(docs_df)

    def gen(batches):
        for pdf in batches:
            out = {k: [] for k in
                   ("clip_id", "bytes", "sample_rate", "n_samples",
                    "fingerprint", "envelope")}

            def emit(cid, pcm, sr):
                data = encode_audio(pcm, sr)
                dec, _ = decode_audio(data)
                out["clip_id"].append(cid)
                out["bytes"].append(data)
                out["sample_rate"].append(sr)
                out["n_samples"].append(len(dec))
                out["fingerprint"].append(audio_fingerprint64(dec, sr))
                out["envelope"].append(rms_envelope(dec))

            for rid in pdf[id_col].astype(str):
                pcm = synth_samples(rid)
                emit(f"aud_{rid}", pcm, 16_000)
                rng = np.random.RandomState(
                    int.from_bytes(
                        hashlib.blake2b((rid + str(seed)).encode(),
                                        digest_size=4).digest(), "little")
                )
                if rng.rand() < dup_fraction:
                    noisy = np.clip(
                        pcm.astype(np.int32)
                        + rng.normal(0, 60, len(pcm)).astype(np.int32),
                        -32768, 32767,
                    ).astype(np.int16)
                    emit(f"aud_{rid}_dup", noisy, 16_000)
            yield pd.DataFrame(out)

    return docs_df.select(id_col).mapInPandas(gen, schema=schema)
