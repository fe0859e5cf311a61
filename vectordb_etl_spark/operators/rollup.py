"""Time-series rollups — hypertable-style multi-resolution aggregates
(beyond-reference; the reference has no time-series surface at all).

``time_rollup`` computes aggregates at several time granularities in ONE
pass: each row expands map-side into its (grain, truncated-ts) pairs — the
same physical shape Catalyst's Expand node gives GROUPING SETS — and a
single partial+final hash aggregate produces every granularity. One scan and
one shuffle total, vs. one full scan + shuffle per granularity with the
naive loop. At 100 TB that's the difference between 1 and G scans.

``sliding_window_agg`` is the moving-average form over event time (window
frame RANGE BETWEEN), the batch twin of the streaming windowed aggregate in
streaming/ingest.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

GRAINS = ("minute", "hour", "day", "week", "month", "year")


def time_rollup(
    df: DataFrame,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    grains: tuple[str, ...] = ("hour", "day"),
    aggs: dict[str, Column] | None = None,
) -> DataFrame:
    """Aggregates at each requested granularity in one pass.

    Output: (grain, bucket_ts, *group_cols, *agg_cols) — the long format a
    downsampling dashboard reads directly. Implemented by exploding each row
    into its (grain, truncated-ts) pairs then one groupBy — the explode is
    map-side (G small structs per row); the aggregate is one shuffle.
    """
    for g in grains:
        if g not in GRAINS:
            raise ValueError(f"unknown grain {g!r}")
    group_cols = group_cols or []
    aggs = aggs or {"n": F.count("*")}
    pairs = F.array(
        *[
            F.struct(
                F.lit(g).alias("grain"),
                F.date_trunc(g, F.col(ts_col)).alias("bucket_ts"),
            )
            for g in grains
        ]
    )
    exploded = df.withColumn("__g", F.explode(pairs))
    return (
        exploded.groupBy(
            F.col("__g.grain").alias("grain"),
            F.col("__g.bucket_ts").alias("bucket_ts"),
            *group_cols,
        )
        .agg(*[c.alias(n) for n, c in aggs.items()])
    )


def time_rollup_sql(
    table: str,
    ts_col: str = "ts",
    group_cols: list[str] | None = None,
    grains: tuple[str, ...] = ("hour", "day"),
    agg_sql: dict[str, str] | None = None,
) -> str:
    """DuckDB oracle: UNION ALL of per-grain aggregates (same result set)."""
    group_cols = group_cols or []
    agg_sql = agg_sql or {"n": "count(*)"}
    gcols = "".join(f", {c}" for c in group_cols)
    aggs = ", ".join(f"{s} AS {n}" for n, s in agg_sql.items())
    parts = [
        f"SELECT '{g}' AS grain, date_trunc('{g}', {ts_col}) AS bucket_ts{gcols}, "
        f"{aggs} FROM {table} GROUP BY 1, 2{''.join(f', {c}' for c in group_cols)}"
        for g in grains
    ]
    return " UNION ALL ".join(parts)


def sliding_window_agg(
    df: DataFrame,
    ts_col: str = "ts",
    value_col: str = "value",
    partition_col: str = "event_type",
    window_seconds: int = 3600,
) -> DataFrame:
    """Per-row trailing-window aggregate (moving average + count) over event
    time: RANGE BETWEEN window frame on integer unix MICROseconds
    (unix_timestamp would truncate sub-second timestamps, blurring the frame
    edge by up to 1 s). One shuffle on the partition key; the frame scan is
    sort-local within each partition.

    The average is computed in EXACT integer micro-units: values quantize
    to 1e-6 units once, the frame sums BIGINTs, and the mean rounds via
    integer arithmetic (floor((2S+n)/(2n)) — half-up toward +inf). Float
    window averages land on exact .xxxxxx5 boundaries whenever the frame
    count is a power of two (at 100k rows, hundreds of rows), where IEEE
    `round` flips per engine; integer arithmetic makes the result
    bit-identical everywhere. Sign-correct for NEGATIVE values too: the
    floor is taken via the pmod identity ``(a - pmod(a, b)) DIV b``
    (pmod is always >= 0, so the quotient IS floor(a/b)). Both Spark's
    bare DIV and DuckDB's integer ``//`` truncate toward zero, which
    breaks the half-up identity on negative sums (avg -2/3 would "round"
    to 0); a SQL restatement must use the matching mod identity —
    ``(a - ((a % b + b) % b)) // b`` — as the registered
    ``events_moving_avg`` oracle does."""
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy(partition_col)
        .orderBy(F.unix_micros(F.col(ts_col)))
        .rangeBetween(-window_seconds * 1_000_000, 0)
    )
    iv = F.round(F.col(value_col) * F.lit(1_000_000.0)).cast("long")
    framed = df.select(
        partition_col,
        F.col(ts_col),
        F.col(value_col),
        F.sum(iv).over(w).alias("__s"),
        F.count("*").over(w).alias("__n"),
    )
    return framed.select(
        partition_col,
        ts_col,
        value_col,
        (
            F.expr(
                "((2 * __s + __n) - pmod(2 * __s + __n, 2 * __n)) "
                "DIV (2 * __n)"
            ).cast("double")
            / F.lit(1_000_000.0)
        ).alias("moving_avg"),
        F.col("__n").alias("window_n"),
    )
