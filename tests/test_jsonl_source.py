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


def test_read_jsonl_does_not_mutate_schema(spark, jsonl_path):
    from pyspark.sql.types import StructType

    struct = StructType.fromDDL(SCHEMA)
    before = [f.name for f in struct.fields]
    read_jsonl(spark, jsonl_path, struct)
    # the caller's StructType must come back untouched (StructType.add
    # mutates in place — the parse schema is built fresh)
    assert [f.name for f in struct.fields] == before
    # and a second call with the SAME object must not trip the
    # reserved-column check or carry a stray corrupt column
    good, _ = read_jsonl(spark, jsonl_path, struct)
    assert good.columns == ["doc_id", "text", "lang"]
    assert good.count() == 3


def test_read_jsonl_plan_has_no_cache(spark, jsonl_path):
    good, bad = read_jsonl(spark, jsonl_path, SCHEMA)
    # 100 TB read path: neither output may hang a full-corpus cache off
    # the scan (the SPARK-21610 workaround this source used to need)
    for df in (good, bad):
        plan = df._jdf.queryExecution().toString()
        assert "InMemoryRelation" not in plan
        assert "InMemoryTableScan" not in plan
