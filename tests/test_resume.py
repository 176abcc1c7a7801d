"""Resume test (north rule): a killed pipeline re-run must skip completed
stages (no recompute) and produce identical output."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.config import DedupConfig
from fuzzymatch_spark.plans.pipeline import DedupPipeline

WORK = "/tmp/fuzzymatch_test_pipeline"


@pytest.fixture()
def workdir():
    shutil.rmtree(WORK, ignore_errors=True)
    yield WORK
    shutil.rmtree(WORK, ignore_errors=True)


def _clusters_set(df):
    return {(r["id"], r["cluster_id"]) for r in df.collect()}


def test_pipeline_runs_and_resumes(spark, documents, workdir):
    cfg = DedupConfig(min_score=0.9)
    docs = documents.limit(200)

    p1 = DedupPipeline(spark, workdir, cfg, id_col="doc_id", text_col="text",
                       use_suffix_stage=True)
    out1 = p1.run(docs)
    first = _clusters_set(out1)
    assert len(first) == 200
    recomputed1 = {m["stage"]: m["recomputed"] for m in p1.metrics}
    assert all(recomputed1.values()), recomputed1

    # simulate a kill after stage 2: delete stages 3+ markers
    for stage in ("scored_edges", "clusters"):
        shutil.rmtree(os.path.join(workdir, stage), ignore_errors=True)

    p2 = DedupPipeline(spark, workdir, cfg, id_col="doc_id", text_col="text",
                       use_suffix_stage=True)
    out2 = p2.run(docs)
    second = _clusters_set(out2)
    recomputed2 = {m["stage"]: m["recomputed"] for m in p2.metrics}
    assert recomputed2["signatures"] is False  # resumed, not recomputed
    assert recomputed2["candidate_edges"] is False
    assert recomputed2["scored_edges"] is True  # was killed, recomputed
    assert recomputed2["clusters"] is True
    assert first == second

    # completion markers carry row counts (lineage)
    with open(os.path.join(workdir, "signatures", "_DONE")) as f:
        meta = json.loads(f.read())
    assert meta["rows"] == 200
    # run_config lineage persisted
    assert os.path.exists(os.path.join(workdir, "run_config.json"))
    # metrics table written
    m = spark.read.parquet(os.path.join(workdir, "metrics"))
    assert {r["stage"] for r in m.collect()} >= {
        "signatures", "candidate_edges", "scored_edges", "clusters"
    }


def test_full_rerun_idempotent(spark, documents, workdir):
    cfg = DedupConfig(min_score=0.9)
    docs = documents.limit(100)
    p1 = DedupPipeline(spark, workdir, cfg, id_col="doc_id", text_col="text")
    first = _clusters_set(p1.run(docs))
    p2 = DedupPipeline(spark, workdir, cfg, id_col="doc_id", text_col="text")
    second = _clusters_set(p2.run(docs))
    assert first == second
    assert all(m["recomputed"] is False for m in p2.metrics
               if m["stage"] != "metrics")


def test_pipeline_mirror_edge_source(spark, workdir):
    """A stored dihedral-canonical pHash column adds the 'mirror' edge
    source: a mirrored re-post whose caption LSH (deliberately weak 1x16
    banding here) misses is still clustered via canonical Hamming 0 +
    caption verify — and without cphash_col the same input leaves the
    pair split (the control that proves the source added recall)."""
    cfg = DedupConfig(min_score=0.55, num_perm=16, bands=1,
                      rows_per_band=16)
    rows = [
        ("m1", "a striking red barn standing in a green summer field "
               "under clouds", 777123),
        ("m2", "a striking red barn standing in a quiet autumn field "
               "under clouds", 777123),  # mirrored: same canonical hash
        ("x1", "completely unrelated caption about city traffic at night",
         111),
        ("x2", "another different caption describing a mountain lake",
         222),
    ]
    df = spark.createDataFrame(
        rows, "image_id string, caption string, cphash long"
    )

    ctrl = DedupPipeline(spark, os.path.join(workdir, "ctrl"), cfg,
                         use_suffix_stage=False).run(df)
    c = {r["id"]: r["cluster_id"] for r in ctrl.collect()}
    assert c["m1"] != c["m2"], (
        "control must not link the pair (caption LSH found it; weaken "
        "the caption overlap)"
    )

    mdir = os.path.join(workdir, "with_mirror")
    out = DedupPipeline(spark, mdir, cfg, cphash_col="cphash",
                        use_suffix_stage=False).run(df)
    got = {r["id"]: r["cluster_id"] for r in out.collect()}
    assert got["m1"] == got["m2"]
    assert got["x1"] != got["x2"] != got["m1"]

    cand = spark.read.parquet(os.path.join(mdir, "candidate_edges"))
    assert {r["source"] for r in cand.collect()} >= {"mirror"}


def test_pipeline_gate_and_canonical_stages(spark, workdir):
    """Image-input extras: stage 0 filters gate-rejects before any codec
    pass (and checkpoints reject reasons + aspect buckets as lineage),
    stage 4b flags each cluster's max-pixels survivor; both stages
    resume like every other checkpoint."""
    rows = []
    for i in range(40):
        cap = f"caption number {i} " + " ".join(
            f"tok{i * 100 + j}q" for j in range(8)
        )
        rows.append((i, 300 + i, 300, "png", cap))
    # planted near-dup pair: identical captions, 101 has more pixels
    pair_cap = "identical caption text for the planted survivor pair"
    rows.append((100, 200, 200, "png", pair_cap))
    rows.append((101, 400, 400, "png", pair_cap))
    # rejected row: min side < 64 (precedence: too_small before aspect)
    rows.append((200, 10, 500, "png", "this row never reaches a codec"))
    df = spark.createDataFrame(
        rows, "doc_id long, w int, h int, fmt string, caption string"
    )

    def mk():
        return DedupPipeline(
            spark, WORK, DedupConfig(min_score=0.9), id_col="doc_id",
            text_col="caption", use_suffix_stage=False,
            apply_gate=True, select_canonical=True,
            emit_batches=4, batch_shards=2,
        )

    p1 = mk()
    out1 = p1.run(df)
    got = {r["id"]: r for r in out1.collect()}
    assert 200 not in got
    assert got[100]["cluster_id"] == got[101]["cluster_id"]
    assert got[101]["is_canonical"] == 1 and got[100]["is_canonical"] == 0
    assert got[100]["pixels"] == 40000
    stages = [m["stage"] for m in p1.metrics]
    assert stages[0] == "gate" and "canonical" in stages

    gate = spark.read.parquet(os.path.join(WORK, "gate"))
    grow = {r["image_id"]: r for r in gate.collect()}
    assert grow[200]["reject_reason"] == "too_small"
    assert grow[200]["bucket_w"] is None and grow[200]["keep"] == 0
    assert grow[0]["keep"] == 1 and grow[0]["bucket_w"] is not None

    # stage 4c manifest: exactly the canonical survivors, bucketed and
    # batched; at most one trailing non-full batch per (bucket, shard)
    manifest = spark.read.parquet(os.path.join(WORK, "manifest"))
    mrows = manifest.collect()
    assert {r["id"] for r in mrows} == {
        i for i, r in got.items() if r["is_canonical"] == 1
    }
    assert all(r["bucket_w"] is not None for r in mrows)
    import collections
    fill = collections.Counter(
        (r["bucket_w"], r["bucket_h"], r["shard"], r["batch_idx"])
        for r in mrows
    )
    trailing = collections.Counter()
    for (bw, bh, sh, b), n in fill.items():
        assert n <= 4
        if n < 4:
            trailing[(bw, bh, sh)] += 1
    assert all(v == 1 for v in trailing.values())

    with pytest.raises(ValueError):
        DedupPipeline(
            spark, WORK + "_bad", DedupConfig(), id_col="doc_id",
            text_col="caption", emit_batches=4,
        ).run(df)

    p2 = mk()
    out2 = p2.run(df)
    assert not any(m["recomputed"] for m in p2.metrics)
    key = lambda rs: {
        (r["id"], r["cluster_id"], r["is_canonical"]) for r in rs
    }
    assert key(out2.collect()) == key(out1.collect())


def test_pipeline_emit_resized_stage(spark, workdir):
    """Stage 4d: the resized-payload emit contains EXACTLY the canonical
    survivors, every image at its aspect bucket's dims (one ladder drives
    gate buckets and resize targets), hive-partitioned by (w, h), and the
    stage resumes like every other checkpoint."""
    from fuzzymatch_spark.sources.images import decode_image, encode_image, synth_pixels

    ladder = ((64, 128), (96, 96), (128, 64))
    rows = []
    for i in range(12):
        w, h = 70 + 4 * i, 130 - 3 * i
        cap = f"caption number {i} " + " ".join(
            f"tok{i * 100 + j}q" for j in range(8)
        )
        rows.append((f"i{i:02d}", encode_image(synth_pixels(f"i{i:02d}", w, h), "png"),
                     w, h, "png", cap))
    # planted near-dup pair: identical captions; p1 has more pixels
    pair_cap = "identical caption text for the planted survivor pair"
    rows.append(("p0", encode_image(synth_pixels("p0", 80, 80), "png"),
                 80, 80, "png", pair_cap))
    rows.append(("p1", encode_image(synth_pixels("p1", 160, 160), "png"),
                 160, 160, "png", pair_cap))
    # gate reject: never reaches a codec, never appears downstream
    rows.append(("rej", b"\x00", 10, 500, "png", "this row never reaches a codec"))
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string, caption string",
    )

    def mk():
        return DedupPipeline(
            spark, WORK, DedupConfig(min_score=0.9), use_suffix_stage=False,
            apply_gate=True, select_canonical=True,
            emit_batches=4, batch_shards=2, emit_resized=True,
            aspect_ladder=ladder,
        )

    p1 = mk()
    clusters = {r["id"]: r for r in p1.run(df).collect()}
    assert clusters["p1"]["is_canonical"] == 1
    assert clusters["p0"]["is_canonical"] == 0

    resized = spark.read.parquet(os.path.join(WORK, "resized"))
    got = {r["image_id"]: r for r in resized.collect()}
    want_ids = {i for i, r in clusters.items() if r["is_canonical"] == 1}
    assert set(got) == want_ids and "p0" not in got and "rej" not in got

    gate = spark.read.parquet(os.path.join(WORK, "gate"))
    bucket = {r["image_id"]: (r["bucket_w"], r["bucket_h"]) for r in gate.collect()}
    for iid, r in got.items():
        assert (r["w"], r["h"]) == bucket[iid], iid
        assert (r["w"], r["h"]) in ladder
        px = decode_image(bytes(r["bytes"]))
        assert px.shape == (r["h"], r["w"]) and r["fmt"] == "png"

    # hive layout: loader prunes to one tensor shape at the source
    part_dirs = [d for d in os.listdir(os.path.join(WORK, "resized"))
                 if d.startswith("w=")]
    assert part_dirs, os.listdir(os.path.join(WORK, "resized"))

    p2 = mk()
    p2.run(df)
    assert not any(m["recomputed"] for m in p2.metrics)
    assert "resized" in [m["stage"] for m in p2.metrics]

    with pytest.raises(ValueError):
        DedupPipeline(
            spark, WORK + "_bad", DedupConfig(), emit_resized=True,
        ).run(df)


def test_pipeline_decontamination_stage(spark, workdir):
    """Stage 1b: corpus images within the pHash radius of a benchmark
    table are checkpointed as lineage (hit counts + min Hamming),
    excluded from clustering, and their bytes never reach the resized
    emit; the stage resumes like every other checkpoint."""
    import hashlib

    from fuzzymatch_spark.sources.images import encode_image, synth_pixels

    def h64(i):
        return int.from_bytes(
            hashlib.md5(f"ph{i}".encode()).digest()[:8], "big"
        ) >> 1

    ladder = ((64, 128), (96, 96), (128, 64))
    rows = []
    for i in range(12):
        w, h = 70 + 4 * i, 130 - 3 * i
        cap = f"caption number {i} " + " ".join(
            f"tok{i * 100 + j}q" for j in range(8)
        )
        rows.append((f"i{i:02d}",
                     encode_image(synth_pixels(f"i{i:02d}", w, h), "png"),
                     w, h, "png", cap, h64(i)))
    df = spark.createDataFrame(
        rows,
        "image_id string, bytes binary, w int, h int, fmt string,"
        " caption string, phash long",
    )
    # benchmark: a 2-bit near-twin of i03's hash, plus one far hash
    bench_path = os.path.join(WORK, "bench_in")
    spark.createDataFrame(
        [("ev0", h64(3) ^ 3), ("ev1", h64(999))],
        "bench_id string, phash long",
    ).write.parquet(bench_path)

    def mk():
        return DedupPipeline(
            spark, WORK, DedupConfig(min_score=0.9), use_suffix_stage=False,
            phash_col="phash", apply_gate=True, select_canonical=True,
            emit_resized=True, aspect_ladder=ladder,
            decontaminate_bench=bench_path,
        )

    p1 = mk()
    clusters = {r["id"] for r in p1.run(df).collect()}
    assert "i03" not in clusters
    assert clusters == {f"i{i:02d}" for i in range(12) if i != 3}
    assert "decon" in [m["stage"] for m in p1.metrics]

    flagged = {r["id"]: r for r in spark.read.parquet(
        os.path.join(WORK, "decon")).collect()}
    assert len(flagged) == 12  # full corpus grain = lineage
    assert flagged["i03"]["contaminated"] == 1
    assert flagged["i03"]["n_bench_hits"] == 1
    assert flagged["i03"]["min_hamming"] == 2
    assert all(r["contaminated"] == 0 for i, r in flagged.items()
               if i != "i03")

    resized = spark.read.parquet(os.path.join(WORK, "resized"))
    assert "i03" not in {r["image_id"] for r in resized.collect()}

    p2 = mk()
    p2.run(df)
    assert not any(m["recomputed"] for m in p2.metrics)

    with pytest.raises(ValueError, match="phash_col"):
        DedupPipeline(
            spark, WORK + "_bad", DedupConfig(),
            decontaminate_bench=bench_path,
        ).run(df)
