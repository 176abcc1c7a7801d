"""Pure-numpy scoring kernels (no Spark dependency).

These pin the reference's scoring semantics (golden fixtures in FIXTURES.md)
before any distribution concern; the Spark layer wraps them in Arrow-batched
pandas UDFs.
"""

from fuzzymatch_spark.kernels.normalize import (
    char_bitmask,
    normalize_bytes,
    normalize_text,
)
from fuzzymatch_spark.kernels.trigrams import shared_trigram_count, trigram_set
from fuzzymatch_spark.kernels.editdist import (
    batch_substring_distance,
    normalized_score,
    prefix_edit_distance,
    substring_edit_distance,
)
from fuzzymatch_spark.kernels.scoring import PreparedQuery, prepare_query, score_pair
from fuzzymatch_spark.kernels.sw import smith_waterman_score, sw_bonus_array

__all__ = [
    "char_bitmask",
    "normalize_bytes",
    "normalize_text",
    "trigram_set",
    "shared_trigram_count",
    "prefix_edit_distance",
    "substring_edit_distance",
    "batch_substring_distance",
    "normalized_score",
    "PreparedQuery",
    "prepare_query",
    "score_pair",
    "smith_waterman_score",
    "sw_bonus_array",
]
