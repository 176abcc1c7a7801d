"""JSONL source: schema-enforced read, malformed-line quarantine, and the
good/bad split accounting for every input line."""

import pytest

from fuzzymatch_spark.sources.jsonl import read_jsonl

SCHEMA = "doc_id bigint, text string, lang string"

LINES = [
    '{"doc_id": 1, "text": "hello world", "lang": "en"}',
    '{"doc_id": 2, "text": "bonjour", "lang": "fr"}',
    'this is not json at all',
    '{"doc_id": 3, "text": "unterminated',
    '{"doc_id": 4, "text": "extra fields fine", "lang": "de", "x": 9}',
]


@pytest.fixture()
def jsonl_path(tmp_path):
    p = tmp_path / "corpus.jsonl"
    p.write_text("\n".join(LINES) + "\n")
    return str(p)


def test_read_jsonl_split(spark, jsonl_path):
    good, bad = read_jsonl(spark, jsonl_path, SCHEMA)
    rows = {r["doc_id"]: r for r in good.collect()}
    assert set(rows) == {1, 2, 4}
    assert rows[1]["text"] == "hello world"
    assert rows[4]["lang"] == "de"          # undeclared fields ignored
    assert good.columns == ["doc_id", "text", "lang"]  # no corrupt col

    quarantined = sorted(r["raw"] for r in bad.collect())
    assert quarantined == sorted([LINES[2], LINES[3]])
    # every input line is accounted for: good + quarantined == total
    assert good.count() + bad.count() == len(LINES)


def test_read_jsonl_rejects_reserved_column(spark, jsonl_path):
    with pytest.raises(ValueError):
        read_jsonl(spark, jsonl_path, "_corrupt_record string, a int")
