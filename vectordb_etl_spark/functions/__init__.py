"""Column-expression function library (the SQL-expressible operator tier).

Every function here has two renderings generated from shared pattern data:
a PySpark ``Column`` (JVM-side, whole-stage-codegen friendly) and a DuckDB
SQL string used as the correctness oracle. No Python UDFs in this package.
"""

from vectordb_etl_spark.functions.cleaning import (
    clean_hwp_text_col,
    clean_hwp_text_sql,
    clean_text_col,
    clean_text_sql,
)
from vectordb_etl_spark.functions.language import (
    detect_language_content_col,
    detect_language_content_sql,
    detect_language_query,
    detect_language_query_col,
    detect_language_query_sql,
)
from vectordb_etl_spark.functions.text import (
    chunk_id_col,
    chunk_id_sql,
    doc_fingerprint_col,
    doc_fingerprint_sql,
    estimate_tokens_col,
    estimate_tokens_sql,
    quality_score_cols,
    truncate_cols,
)
from vectordb_etl_spark.functions.vector import (
    cosine_col,
    dot_col,
    l2_normalize_col,
    norm_col,
)

__all__ = [
    "clean_text_col",
    "clean_text_sql",
    "clean_hwp_text_col",
    "clean_hwp_text_sql",
    "detect_language_content_col",
    "detect_language_content_sql",
    "detect_language_query",
    "detect_language_query_col",
    "detect_language_query_sql",
    "estimate_tokens_col",
    "estimate_tokens_sql",
    "chunk_id_col",
    "chunk_id_sql",
    "doc_fingerprint_col",
    "doc_fingerprint_sql",
    "quality_score_cols",
    "truncate_cols",
    "dot_col",
    "cosine_col",
    "norm_col",
    "l2_normalize_col",
]
