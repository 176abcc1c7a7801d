from fuzzymatch_spark.sources.images import (
    build_images_df,
    decode_image,
    encode_image,
    make_phash_udf,
    synth_pixels,
)

__all__ = [
    "build_images_df",
    "decode_image",
    "encode_image",
    "make_phash_udf",
    "synth_pixels",
]
