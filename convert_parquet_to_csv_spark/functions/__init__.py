"""Scalar/array function library: text analysis, vector math."""

from convert_parquet_to_csv_spark.functions.text import (
    doc_fingerprint,
    lang_id,
    normalize_text,
    quality_features,
    shingles,
    token_count_bpe,
    tokens,
)
from convert_parquet_to_csv_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "cosine_similarity",
    "doc_fingerprint",
    "dot_product",
    "l2_norm",
    "lang_id",
    "normalize_text",
    "quality_features",
    "shingles",
    "token_count_bpe",
    "tokens",
]
