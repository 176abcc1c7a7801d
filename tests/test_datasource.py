"""Spark 4 Python DataSource: registration, partition-parallel read,
determinism, schema, and agreement with the batch synthesis path."""

import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.sources.datasource import SyntheticImagesDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SyntheticImagesDataSource)
    return spark


def _load(spark, **opts):
    r = spark.read.format("fuzzy_synth_images")
    for k, v in opts.items():
        r = r.option(k, str(v))
    return r.load()


def test_datasource_schema_and_rows(registered):
    df = _load(registered, rows=40, partitions=4, dup_fraction=0.0)
    assert df.schema.simpleString() == (
        "struct<image_id:string,bytes:binary,w:int,h:int,fmt:string,"
        "caption:string,phash:bigint>"
    )
    rows = df.collect()
    assert len(rows) == 40  # no dups at fraction 0
    assert len({r["image_id"] for r in rows}) == 40
    assert all(r["w"] == 48 and r["h"] == 48 for r in rows)
    assert all(r["fmt"] in ("png", "jpeg") for r in rows)
    assert all(len(r["caption"].split()) >= 5 for r in rows)


def test_datasource_partition_parallelism(registered):
    df = _load(registered, rows=32, partitions=8, dup_fraction=0.0)
    assert df.rdd.getNumPartitions() == 8
    # partition split covers every row exactly once
    assert df.count() == 32


def test_datasource_deterministic_and_dups(registered):
    a = sorted((r["image_id"], r["phash"]) for r in
               _load(registered, rows=60, partitions=4).collect())
    b = sorted((r["image_id"], r["phash"]) for r in
               _load(registered, rows=60, partitions=4).collect())
    assert a == b
    # near-dup twins exist at the default fraction and share a base id
    ids = [i for i, _ in a]
    dups = [i for i in ids if i.endswith("_dup")]
    assert dups and all(i[: -len("_dup")] in set(ids) for i in dups)


def test_datasource_decodes_and_hamming_close_twins(registered):
    from fuzzymatch_spark.sources.images import decode_image, psnr, synth_pixels

    df = _load(registered, rows=30, partitions=2, dup_fraction=1.0)
    rows = {r["image_id"]: r for r in df.collect()}
    base = [r for i, r in rows.items() if not i.endswith("_dup")]
    # pixels decode to the deterministic synthesis (PSNR >= 40 dB)
    for r in base[:5]:
        rid = r["image_id"][len("img_"):]
        assert psnr(decode_image(bytes(r["bytes"])),
                    synth_pixels(rid)) >= 40.0
    # twins are pHash-near their originals
    for r in base:
        twin = rows.get(r["image_id"] + "_dup")
        assert twin is not None
        assert bin(r["phash"] ^ twin["phash"]).count("1") <= 6
