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
    gopher_pass_col,
    gopher_pass_sql,
    gopher_signal_cols,
    gopher_signal_sql,
    quality_score_cols,
    truncate_cols,
)
from vectordb_etl_spark.functions.curation import (
    deterministic_sample,
    pii_hit_counts_col,
    pii_hit_counts_sql,
    redact_pii_col,
    redact_pii_sql,
    sample_bucket_col,
    sample_bucket_sql,
    stratified_sample,
)
from vectordb_etl_spark.functions.filter_expr import (
    FilterExprError,
    parse_filter,
)
from vectordb_etl_spark.functions.sketches import (
    cm_lookup,
    cm_lookup_sql,
    cm_merge,
    cm_sketch,
    cm_sketch_sql,
    hll_distinct,
    hll_distinct_sql,
    hll_merge,
    hll_registers,
    hll_registers_sql,
    kmv_estimate_cols,
    kmv_jaccard,
    kmv_merge,
    kmv_registers,
    kmv_registers_sql,
)
from vectordb_etl_spark.functions.vector import (
    cosine_col,
    dot_col,
    l2_normalize_col,
    norm_col,
    sq8_dequantize_col,
    sq8_quantize_col,
)

__all__ = [
    "parse_filter",
    "FilterExprError",
    "redact_pii_col",
    "redact_pii_sql",
    "pii_hit_counts_col",
    "pii_hit_counts_sql",
    "deterministic_sample",
    "stratified_sample",
    "sample_bucket_col",
    "sample_bucket_sql",
    "sq8_quantize_col",
    "sq8_dequantize_col",
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
    "hll_distinct",
    "hll_distinct_sql",
    "hll_registers",
    "hll_registers_sql",
    "hll_merge",
    "kmv_registers",
    "kmv_registers_sql",
    "kmv_estimate_cols",
    "kmv_jaccard",
    "kmv_merge",
    "cm_sketch",
    "cm_sketch_sql",
    "cm_lookup",
    "cm_lookup_sql",
    "cm_merge",
    "dot_col",
    "cosine_col",
    "norm_col",
    "l2_normalize_col",
]
