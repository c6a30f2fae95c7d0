from gotsdb_spark.functions.exprs import (
    cosine,
    dot,
    half_up_round,
    md5_bucket,
    norm,
    word_shingles,
)

__all__ = [
    "cosine",
    "dot",
    "norm",
    "word_shingles",
    "md5_bucket",
    "half_up_round",
]
