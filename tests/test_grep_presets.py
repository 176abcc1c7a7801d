"""fuzzy_grep pipeline + config presets round-trip."""

import json

import pytest

from fuzzymatch_spark.config import (
    DedupConfig,
    EditDistanceConfig,
    GapPenalty,
    MatchConfig,
)
from fuzzymatch_spark.kernels.scoring import prepare_query, score_pair
from fuzzymatch_spark.operators.grep import fuzzy_grep


def test_fuzzy_grep_ordered(spark, tmp_path):
    p = tmp_path / "lines.txt"
    p.write_text(
        "\n".join(
            [
                "def getUser(id):",
                "import os",
                "class UserGetter:",
                "x = 1",
                "get_user_by_id = None",
                "totally unrelated",
            ]
        )
    )
    out = fuzzy_grep(spark, str(p), "getuser",
                     MatchConfig(min_score=0.5)).collect()
    lines = [r["line"] for r in out]
    ids = [r["line_id"] for r in out]
    assert ids == sorted(ids)  # original order preserved
    assert "def getUser(id):" in lines
    assert "get_user_by_id = None" in lines
    assert "totally unrelated" not in lines
    assert "x = 1" not in lines


def test_config_json_roundtrip():
    cfg = MatchConfig(
        min_score=0.42,
        algorithm="smithWaterman",
        edit_distance=EditDistanceConfig.fzf_aligned(),
    )
    j = cfg.to_json()
    back = MatchConfig.from_json(j)
    assert back == cfg
    # mirrors the reference's Codable round-trip (`MatchConfig.swift:58-90`)
    assert json.loads(j)["min_score"] == 0.42


def test_fzf_aligned_preset_values():
    # `MatchConfig.swift:474-478`
    p = EditDistanceConfig.fzf_aligned()
    assert p.word_boundary_bonus == 0.12
    assert p.consecutive_bonus == 0.06
    assert p.gap_penalty == GapPenalty.affine(0.04, 0.012)
    # preset still scores sanely
    cfg = MatchConfig(edit_distance=p)
    assert score_pair("getUserById", prepare_query("gubi", cfg)) is not None


def test_dedup_config_json():
    d = DedupConfig.web_dense()
    assert json.loads(d.to_json())["bands"] == 8
    assert d.bands * d.rows_per_band == d.num_perm
