"""Deployment contract: the pipeline must run via
``spark-submit --py-files dist/fuzzymatch_spark.zip jobs/dedup_job.py``
(north rule) — in a clean process with the package ONLY from the zip."""

import json
import os
import shutil
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.mark.slow
def test_spark_submit_pyfiles(tmp_path):
    subprocess.run(["bash", os.path.join(REPO, "scripts", "package.sh")],
                   check=True, capture_output=True)
    zip_path = os.path.join(REPO, "dist", "fuzzymatch_spark.zip")
    assert os.path.exists(zip_path)

    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    work = str(tmp_path / "run1")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    r = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "dedup_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--id-col", "doc_id",
            "--text-col", "text",
            "--work-dir", work,
            "--profile", "web_dense",
        ],
        capture_output=True,
        text=True,
        timeout=600,
        env=env,
        cwd=str(tmp_path),  # not the repo dir: no implicit source imports
    )
    assert r.returncode == 0, r.stderr[-3000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["rows"] == 500
    assert 0 < summary["clusters"] <= 500
    assert os.path.exists(os.path.join(work, "clusters", "_DONE"))


@pytest.mark.slow
def test_spark_submit_curate_job_with_new_stages(tmp_path):
    subprocess.run(["bash", os.path.join(REPO, "scripts", "package.sh")],
                   check=True, capture_output=True)
    zip_path = os.path.join(REPO, "dist", "fuzzymatch_spark.zip")
    spark_submit = shutil.which("spark-submit") or os.path.join(
        os.path.dirname(sys.executable), "spark-submit"
    )
    out = str(tmp_path / "curated")
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    r = subprocess.run(
        [
            spark_submit,
            "--master", "local[4]",
            "--conf", "spark.ui.enabled=false",
            "--py-files", zip_path,
            os.path.join(REPO, "jobs", "curate_job.py"),
            "--input", "/root/testdata/sf0.001/documents.parquet",
            "--benchmark-source", "src0",
            "--id-col", "doc_id", "--text-col", "text",
            "--partition-by", "lang",
            "--strata", "lang", "--cap", "1000",
            "--fuzzy-decontaminate",
            "--budget-tokens", "400",
            "--output", out,
        ],
        capture_output=True, text=True, timeout=600, env=env,
        cwd=str(tmp_path),
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "curated corpus written" in r.stdout
    assert os.path.exists(os.path.join(out, "_CURATED"))
    # partitioned sink + some survivors, but bounded by the budget stage
    n = int(r.stdout.strip().splitlines()[-1].split()[3])
    assert 0 < n < 500
