from vector_db_core_spark.functions.exact import dec, dsum, davg
from vector_db_core_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)
from vector_db_core_spark.functions.text import tokens, distinct_tokens, token_shingles

__all__ = [
    "dec",
    "dsum",
    "davg",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
    "tokens",
    "distinct_tokens",
    "token_shingles",
]
