from fuzzymatch_spark.functions.udfs import (
    make_signature_udf,
    make_score_udf,
    make_verify_udf,
)

__all__ = ["make_signature_udf", "make_score_udf", "make_verify_udf"]
