"""One-pass table profiling — per-column statistics for data validation
and optimizer seeding.

Beyond-reference tier (the reference's nearest feature is its corpus
quality report, quality_monitor.py — per-DOCUMENT stats; this is the
per-COLUMN profile an engine's ANALYZE collects): row count, null count,
exact distinct cardinality, and canonical min/max per column, computed
in ONE aggregate pass over the table — every column's aggregates ride
the same scan and map-side combine, so profiling a 100 TB table costs
one read, not a job per column (Spark plans the multi-DISTINCT via a
single Expand, still one scan). The wide 1-row aggregate is then
unpivoted to one row per column with ``stack`` — driver-free.

Determinism: min/max are emitted as canonical STRINGS — raw casts for
integer/string/timestamp columns (verified render-identical in Spark and
DuckDB), integer MICRO-units for float columns (float-to-string is the
one rendering that diverges across engines; the house micro-unit rule —
see operators/rollup.py — sidesteps it). Distinct counts are exact, so
the registered oracle can be an independent per-column restatement.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FLOATY = {"float", "double"}


def _repr_col(col: str, dtype: str, agg: str) -> F.Column:
    fn = F.min(col) if agg == "min" else F.max(col)
    if dtype in _FLOATY:
        return (
            F.round(fn * 1_000_000).cast("bigint").cast("string")
        )
    return fn.cast("string")


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``. Returns one row per
    column: ``(column, n_rows, n_nulls, n_distinct, min_repr,
    max_repr)`` — see module docstring for the min/max canonicalization
    contract. Unknown column names raise immediately."""
    types = dict(df.dtypes)
    columns = columns or [f.name for f in df.schema.fields]
    missing = [c for c in columns if c not in types]
    if missing:
        raise ValueError(f"profile_table: unknown columns {missing}")
    aggs: list[F.Column] = [F.count(F.lit(1)).alias("__n")]
    for c in columns:
        aggs.append((F.count(F.lit(1)) - F.count(c)).alias(f"__nulls_{c}"))
        aggs.append(F.count_distinct(F.col(c)).alias(f"__dist_{c}"))
        aggs.append(_repr_col(c, types[c], "min").alias(f"__min_{c}"))
        aggs.append(_repr_col(c, types[c], "max").alias(f"__max_{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __nulls_{c}, __dist_{c}, __min_{c}, __max_{c}"
        for c in columns
    )
    return wide.select(
        F.expr(
            f"stack({len(columns)}, {stack_args}) AS "
            "(column, n_nulls, n_distinct, min_repr, max_repr)"
        ),
        F.col("__n").alias("n_rows"),
    ).select(
        "column",
        F.col("n_rows").cast("bigint"),
        F.col("n_nulls").cast("bigint"),
        F.col("n_distinct").cast("bigint"),
        "min_repr",
        "max_repr",
    )


def profile_table_sql(
    table: str, columns: list[tuple[str, str]]
) -> str:
    """DuckDB oracle for :func:`profile_table`: an INDEPENDENT
    restatement — one plain aggregate SELECT per column, unioned (no
    stack, no shared scan), with the same canonical min/max rendering.
    ``columns`` is ``[(name, dtype), ...]`` with Spark dtype strings."""
    selects = []
    for name, dtype in columns:
        if dtype in _FLOATY:
            vmin = f"CAST(CAST(round(min({name}) * 1000000) AS BIGINT) AS VARCHAR)"
            vmax = f"CAST(CAST(round(max({name}) * 1000000) AS BIGINT) AS VARCHAR)"
        else:
            vmin = f"CAST(min({name}) AS VARCHAR)"
            vmax = f"CAST(max({name}) AS VARCHAR)"
        selects.append(
            f"SELECT '{name}' AS column, CAST(count(*) AS BIGINT) AS n_rows, "
            f"CAST(count(*) - count({name}) AS BIGINT) AS n_nulls, "
            f"CAST(count(DISTINCT {name}) AS BIGINT) AS n_distinct, "
            f"{vmin} AS min_repr, {vmax} AS max_repr FROM {table}"
        )
    return " UNION ALL ".join(selects)
