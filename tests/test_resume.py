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
