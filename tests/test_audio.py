"""Audio modality: real WAV codec conformance (stdlib-``wave``
cross-checked), fingerprint robustness, and Hamming-band dedup over clip
fingerprints (same band join as images)."""

import numpy as np
import pytest

from fuzzymatch_spark.sources.audio import (
    audio_fingerprint64,
    build_audio_df,
    decode_audio,
    encode_audio,
    synth_samples,
)


def _hamming(a: int, b: int) -> int:
    return bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")


def test_codec_roundtrip_lossless():
    pcm = synth_samples("clip0")
    dec, sr = decode_audio(encode_audio(pcm, 16_000))
    assert sr == 16_000
    assert np.array_equal(dec, pcm)  # PCM WAV is lossless


def test_wav_cross_check_with_stdlib_wave():
    """Our bytes are standard RIFF/WAVE: the stdlib ``wave`` module must
    read them (params + frames exact), and a stdlib-written WAV must
    decode through our decoder — conformance pinned in both directions
    with an independent implementation."""
    import io
    import wave

    pcm = synth_samples("clipwav")
    data = encode_audio(pcm, 16_000)
    with wave.open(io.BytesIO(data)) as w:
        assert (w.getnchannels(), w.getsampwidth(), w.getframerate()) == (
            1, 2, 16_000,
        )
        frames = np.frombuffer(w.readframes(w.getnframes()), dtype="<i2")
    assert np.array_equal(frames, pcm)

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(22_050)
        w.writeframes(pcm.astype("<i2").tobytes())
    dec, sr = decode_audio(buf.getvalue())
    assert sr == 22_050
    assert np.array_equal(dec, pcm)


def test_codec_rejects_unknown_container():
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFFxxxx")
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-ish payload")


def test_fingerprint_robust_and_discriminative():
    rng = np.random.RandomState(3)
    near = []
    fps = []
    for i in range(40):
        pcm = synth_samples(f"clip{i}")
        fp = audio_fingerprint64(pcm, 16_000)
        fps.append(fp)
        noisy = np.clip(
            pcm.astype(np.int32) + rng.normal(0, 60, len(pcm)).astype(np.int32),
            -32768, 32767,
        ).astype(np.int16)
        near.append(_hamming(fp, audio_fingerprint64(noisy, 16_000)))
    assert max(near) <= 2, near  # mild noise stays within the dedup budget
    # ALL unrelated pairs stay outside the dedup budget (the all-pairs form
    # of discriminativeness — 780 pairs, not a handful)
    far = [
        _hamming(fps[i], fps[j])
        for i in range(len(fps))
        for j in range(i + 1, len(fps))
    ]
    assert min(far) > 2, sorted(far)[:10]


def test_audio_dedup_pipeline(spark, documents):
    """End-to-end: synth+encode -> decode -> fingerprint -> Hamming band
    join -> signal-level verify; every planted noisy twin is recovered and
    NO unrelated pair survives the verify tier."""
    from fuzzymatch_spark.operators.dedup import _hamming_band_edges
    from fuzzymatch_spark.operators.multimodal import audio_verify_pairs

    docs = documents.limit(200)
    clips = build_audio_df(spark, docs, "doc_id").persist()
    n = clips.count()
    assert n > 200  # twins present
    cand = _hamming_band_edges(
        clips.select("clip_id", "fingerprint"), "clip_id", "fingerprint",
        n_bands=8, max_hamming=2, source="audio",
    )
    verified = audio_verify_pairs(cand, clips)
    got = {(r["a_id"], r["b_id"]) for r in verified.collect()}
    all_ids = {r["clip_id"] for r in clips.collect()}
    want = {
        (c, f"{c}_dup")
        for c in all_ids
        if not c.endswith("_dup") and f"{c}_dup" in all_ids
    }
    assert want, "fixture produced no twins"
    norm = {tuple(sorted(p)) for p in got}
    assert norm == {tuple(sorted(t)) for t in want}, (
        f"missing={want - got}, spurious={norm - {tuple(sorted(t)) for t in want}}"
    )


def test_audio_verify_payload_free(spark, documents):
    """The verify join must never ship audio bytes nor run per-pair Python:
    digests are computed in the builder, compared JVM-side."""
    from fuzzymatch_spark.operators.dedup import _hamming_band_edges
    from fuzzymatch_spark.operators.multimodal import audio_verify_pairs

    clips = build_audio_df(spark, documents.limit(40), "doc_id")
    cand = _hamming_band_edges(
        clips.select("clip_id", "fingerprint"), "clip_id", "fingerprint",
        n_bands=8, max_hamming=2, source="audio",
    )
    verified = audio_verify_pairs(cand, clips)
    spark.conf.set("spark.sql.debug.maxToStringFields", "1000")
    plan = verified._jdf.queryExecution().executedPlan().toString()
    # the mapInPandas builder necessarily lists its full output schema
    # (Python functions emit every column; pruning happens in the Project
    # right above) — bytes must appear NOWHERE else: no join, no exchange,
    # no projection ships the payload
    bad = [
        ln for ln in plan.splitlines()
        if "bytes#" in ln and "MapInPandas" not in ln
    ]
    assert not bad, f"audio payload column rode the verify plan: {bad}"
    assert "ArrowEvalPython" not in plan, "verify ran a per-pair Python stage"
