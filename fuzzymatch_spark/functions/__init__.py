from fuzzymatch_spark.functions.udfs import (
    make_dl_udf,
    make_score_udf,
    make_signature_udf,
)

__all__ = ["make_dl_udf", "make_score_udf", "make_signature_udf"]
