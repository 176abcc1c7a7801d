from fuzzymatch_spark.streaming.ingest import incremental_signatures

__all__ = ["incremental_signatures"]
