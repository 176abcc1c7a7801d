"""JSONL (newline-delimited JSON) ingestion with corrupt-record
quarantine — the dominant interchange format for web-scale text corpora.

Design points for the 100 TB read path:

* **Schema is mandatory.**  Schema inference is a full extra pass over
  the data before the real read; at corpus scale that doubles the scan
  bill.  Callers pass the DDL string / StructType they expect.
* **PERMISSIVE + quarantine, never DROPMALFORMED.**  Malformed lines are
  captured in a corrupt-record column and split into a quarantine
  DataFrame so the pipeline can account for them (bad-row rate is a
  data-quality signal; silently dropping rows hides upstream breakage).
  Spark disallows filtering on the corrupt column straight off the raw
  scan (SPARK-21610), so the split reads through a cached projection.
* The good-rows output carries only the declared columns — downstream
  operators never see the quarantine column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import StringType, StructType

CORRUPT_COL = "_corrupt_record"


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: str | StructType,
) -> tuple[DataFrame, DataFrame]:
    """Read JSONL at ``path`` with the declared ``schema``.

    Returns ``(good, quarantine)``: ``good`` has exactly the declared
    columns (malformed lines excluded); ``quarantine`` has one ``raw``
    string column holding each malformed line verbatim.
    """
    if isinstance(schema, str):
        struct = StructType.fromDDL(schema)
    else:
        struct = schema
    if CORRUPT_COL in struct.fieldNames():
        raise ValueError(f"schema must not declare {CORRUPT_COL!r}")
    full = struct.add(CORRUPT_COL, StringType())

    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
        .cache()  # SPARK-21610: corrupt-col-only filters need a
        # materialized intermediate, not the raw scan
    )
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    quarantine = (
        df.filter(F.col(CORRUPT_COL).isNotNull())
        .select(F.col(CORRUPT_COL).alias("raw"))
    )
    return good, quarantine
