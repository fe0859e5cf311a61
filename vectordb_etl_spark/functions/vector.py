"""Vector math as higher-order column expressions (operators E3/Q1 support,
SURVEY.md §2.4-2.5).

All JVM-side — `zip_with`/`aggregate`/`transform` over `array<double>`; no
Python in the scoring hot path. Arrays are cast to double so Spark and the
DuckDB oracle (`list_dot_product` on `DOUBLE[]`) accumulate in the same
precision; score comparisons round to 6 dp to absorb summation-order ULPs.

Metric-aware scoring fixes the reference's desc-only assumption
(milvus_store.py:324): COSINE/IP sort descending, L2 ascending.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_col(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def _as_double_array(col: Column | str) -> Column:
    return _as_col(col).cast("array<double>")


def dot_col(a: Column | str, b: Column | str) -> Column:
    """Dot product — `aggregate(zip_with(a, b, *), 0.0, +)`."""
    return F.aggregate(
        F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm_col(a: Column | str) -> Column:
    return F.sqrt(dot_col(a, a))


def cosine_col(a: Column | str, b: Column | str) -> Column:
    """COSINE similarity. For L2-normalized inputs this equals dot product
    (reference relies on that: embeddings.py:36, config.py:23)."""
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def l2_distance_col(a: Column | str, b: Column | str) -> Column:
    diff = F.zip_with(_as_double_array(a), _as_double_array(b), lambda x, y: x - y)
    return F.sqrt(
        F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def l2_normalize_col(a: Column | str) -> Column:
    """E3 — mirror of normalize_embeddings=True (embeddings.py:36,46)."""
    arr = _as_double_array(a)
    n = F.sqrt(
        F.aggregate(
            F.zip_with(arr, arr, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )
    return F.transform(arr, lambda x: x / n)


def score_col(emb: Column | str, query: list[float], metric: str = "COSINE") -> Column:
    """Similarity of a stored vector against a literal query vector.

    The query vector is a plan literal (broadcast with the plan — no shuffle,
    no join); `metric` ∈ {COSINE, IP, L2}.
    """
    q = F.lit(query).cast("array<double>")
    m = metric.upper()
    if m == "COSINE":
        return cosine_col(emb, q)
    if m == "IP":
        return dot_col(emb, q)
    if m == "L2":
        return l2_distance_col(emb, q)
    raise ValueError(f"unknown metric {metric!r}")


def metric_ascending(metric: str) -> bool:
    """Sort direction per metric — L2 is a distance (smaller is better)."""
    return metric.upper() == "L2"


# ---- DuckDB oracle renderings -------------------------------------------


def dot_sql(a: str, b: str) -> str:
    return f"list_dot_product(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


def cosine_sql(a: str, b: str) -> str:
    return f"list_cosine_similarity(CAST({a} AS DOUBLE[]), CAST({b} AS DOUBLE[]))"


# ---- SQ8 scalar quantization (Milvus SQ8 analog; storage tier) -----------
#
# Per-vector min/max int8 quantization: 1 byte per dimension instead of 8
# (array<tinyint> in parquet), dequantize + exact re-score at query time.
# Pure column expressions — deterministic, so the whole
# quantize→dequantize→score path is oracle-checkable in DuckDB with the
# same arithmetic (unlike model-based compression). Max reconstruction
# error per element is step/2 = (max-min)/510.


def sq8_quantize_col(a: Column | str) -> Column:
    """struct(codes array<tinyint>, lo double, step double). Codes are
    shifted by -128 so they store as real 1-byte TINYINTs. Constant vectors
    (step=0) encode as all-zero codes and dequantize to lo."""
    arr = _as_double_array(a)
    lo = F.array_min(arr)
    step = (F.array_max(arr) - lo) / F.lit(255.0)
    codes = F.transform(
        arr,
        lambda x: (
            F.when(step == 0, F.lit(0.0)).otherwise(F.round((x - lo) / step))
        ).cast("int")
        - 128,
    )
    return F.struct(
        codes.cast("array<tinyint>").alias("codes"),
        lo.alias("lo"),
        step.alias("step"),
    )


def sq8_dequantize_col(q: Column | str) -> Column:
    """Inverse: lo + (code+128)*step, as array<double>."""
    c = _as_col(q)
    return F.transform(
        c["codes"], lambda v: c["lo"] + (v.cast("double") + 128.0) * c["step"]
    )


def sq8_roundtrip_sql(expr: str) -> str:
    """DuckDB rendering of dequantize(quantize(expr)) — identical
    arithmetic (round() is half-away-from-zero in both engines for the
    non-negative operands here)."""
    e = f"CAST({expr} AS DOUBLE[])"
    lo = f"list_aggregate({e}, 'min')"
    step = f"((list_aggregate({e}, 'max') - {lo}) / 255.0)"
    code = (
        f"(CAST(round(CASE WHEN {step} = 0 THEN 0.0 ELSE (x - {lo}) / {step} END) "
        f"AS INTEGER) - 128)"
    )
    return (
        f"list_transform({e}, x -> {lo} + (CAST({code} AS DOUBLE) + 128.0) * {step})"
    )
