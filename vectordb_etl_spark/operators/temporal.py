"""Temporal join operators — as-of join and banded range join.

Beyond-reference (the reference has no joins between user tables at all);
these are the canonical "operator Spark lacks" cases from the build brief,
implemented as compositions of existing DataFrame ops (SURVEY.md custom-
operator rule (a)) — no UDF, no cartesian product, fully Catalyst-visible.

**As-of join** (`asof_join`): for each left row, the latest right row with
``right.ts <= left.ts`` per key. Implemented with the union trick:
tag both sides, union, one window over (key, ts) carrying the last non-null
right payload forward, keep left rows. Exactly ONE shuffle (the window
partition by key) regardless of table sizes — vs. the naive inequality join
which is O(n·m) per key. At 100 TB both inputs shuffle once on the key,
which is the lower bound for co-locating them.

**Range join** (`range_join_count`): match right rows with
``ts ∈ [left.ts + lower, left.ts + upper]`` per key. Implemented by bucketing
time into windows of width (upper−lower): a right row lands in 1 bucket, a
left interval covers ≤2 buckets, so the left side is exploded ×2 and the
match becomes an EQUI-join on (key, bucket) + an exact range filter.
Shuffle volume is 2·|left| + |right| — no skewed inequality join, no
broadcast-nested-loop fallback (the plan Spark would otherwise pick).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Left as-of join: latest right row at-or-before each left row's time.

    ``right`` should be deterministic per (on, right_ts) — pre-aggregate if
    multiple rows can share a key+timestamp, or the carried row is undefined
    (same caveat DuckDB's ASOF JOIN has).
    """
    l_tag = left.withColumn("__src", F.lit(1)).withColumn("__ts", F.col(left_ts))
    r_tag = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__src"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__payload"),
    )
    l_norm = l_tag.select(
        F.col(on).alias("__key"),
        "__ts",
        "__src",
        F.lit(None).cast(r_tag.schema["__payload"].dataType).alias("__payload"),
        F.struct(*[F.col(c) for c in left.columns]).alias("__left"),
    )
    r_norm = r_tag.withColumn(
        "__left", F.lit(None).cast(l_norm.schema["__left"].dataType)
    )
    unioned = l_norm.unionByName(r_norm)
    # right rows (src=0) sort before left rows at equal ts → "<=" semantics
    w = (
        Window.partitionBy("__key")
        .orderBy("__ts", "__src")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        "__match", F.last("__payload", ignorenulls=True).over(w)
    ).withColumn("__match_ts", F.last(
        F.when(F.col("__src") == 0, F.col("__ts")), ignorenulls=True
    ).over(w))
    out = carried.filter(F.col("__src") == 1)
    if tolerance_seconds is not None:
        # integer-micros gap: unix_timestamp truncates to whole seconds and
        # would admit matches up to tolerance+0.999999 s
        in_tol = (
            F.unix_micros("__ts") - F.unix_micros("__match_ts")
        ) <= tolerance_seconds * 1_000_000
        out = out.withColumn(
            "__match", F.when(in_tol, F.col("__match"))
        )
    return out.select(
        *[F.col(f"__left.{c}").alias(c) for c in left.columns],
        *[F.col(f"__match.{c}").alias(c) for c in right_cols],
    )


def _bucket(ts: Column, width_s: int) -> Column:
    # Whole-second bucketing is fine even though the exact band filter below
    # is microsecond-exact: the bucket is only a superset pre-filter. For
    # integer lower/upper, exact r ∈ [l+lower, l+upper] implies
    # floor(r) ∈ [floor(l)+lower, floor(l)+upper], which is exactly the
    # bucket range the left side explodes into.
    return F.floor(F.unix_timestamp(ts) / F.lit(width_s))


def range_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
) -> DataFrame:
    """Inner banded join: pairs where
    ``right.ts - left.ts ∈ [lower_seconds, upper_seconds]`` and keys match.
    Returns left columns + right columns (right's key/ts renamed with ``r_``
    prefix when they collide). Bucketed equi-join, see module docstring."""
    width = max(1, upper_seconds - lower_seconds)
    r_renames = {
        c: (f"r_{c}" if c in left.columns else c) for c in right.columns
    }
    r = right.select(
        *[F.col(c).alias(n) for c, n in r_renames.items()]
    ).withColumn("__bucket", _bucket(F.col(r_renames[right_ts]), width))
    r_key, r_ts = r_renames[on], r_renames[right_ts]

    start = F.unix_timestamp(F.col(left_ts)) + F.lit(lower_seconds)
    l_exp = left.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(start / width).cast("long"),
                F.floor((start + F.lit(width)) / width).cast("long"),
            )
        ),
    )
    # microsecond-exact band check (unix_timestamp would truncate sub-second
    # timestamps and blur the band edges by up to 1 s)
    delta_us = F.unix_micros(F.col(r_ts)) - F.unix_micros(F.col(left_ts))
    return (
        l_exp.join(r, (F.col(on) == F.col(r_key)) & (l_exp["__bucket"] == r["__bucket"]))
        .filter(delta_us.between(lower_seconds * 1_000_000, upper_seconds * 1_000_000))
        .drop("__bucket", r_key)
    )


def range_join_count(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    lower_seconds: int,
    upper_seconds: int,
    group_cols: list[str],
    count_alias: str = "n_matches",
) -> DataFrame:
    """Count right rows in each left row's time band (the common rollup form
    of a range join). Same bucketed plan + one aggregation."""
    joined = range_join(
        left, right, on, left_ts, right_ts, lower_seconds, upper_seconds
    )
    return joined.groupBy(*group_cols).agg(F.count("*").alias(count_alias))


# --------------------------------------------------------------------------
# SCD2 interval builder — gaps-and-islands change tracking
# --------------------------------------------------------------------------

SCD2_SENTINEL_DATE = "9999-12-31"


def scd2_intervals(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    time_col: str,
    tie_col: str,
) -> DataFrame:
    """Slowly-changing-dimension (type 2) interval builder: collapse each
    key's change events into half-open validity intervals of the tracked
    attribute. Consecutive events with the SAME attribute value extend
    one interval; a change opens the next. Classic gaps-and-islands:
    island id = row_number over (key, time) minus row_number over (key,
    attr, time) — pure windows, no self-join, no UDF.

    Output: ``(key, attr, valid_from, valid_to, n_rows, is_current)``
    where ``valid_to`` is the NEXT interval's ``valid_from`` (half-open)
    and the sentinel date 9999-12-31 marks the open interval. ``tie_col``
    makes same-timestamp event order total, so the islands — and the
    hash — are deterministic on any engine/partitioning.

    Scale shape: all three windows and the island aggregation partition
    by the key — ONE shuffle co-locates everything; per-key work is a
    sort of that key's own events, bounded by the hottest key, never the
    table.
    """
    w_all = Window.partitionBy(key_col).orderBy(time_col, tie_col)
    w_attr = Window.partitionBy(key_col, attr_col).orderBy(time_col, tie_col)
    isl = (F.row_number().over(w_all) - F.row_number().over(w_attr)).alias(
        "__island"
    )
    grouped = (
        df.select(key_col, attr_col, time_col, tie_col)
        .withColumn("__island", isl)
        .groupBy(key_col, attr_col, "__island")
        .agg(
            F.min(time_col).alias("valid_from"),
            F.count("*").alias("n_rows"),
        )
    )
    w_seq = Window.partitionBy(key_col).orderBy("valid_from", attr_col)
    sentinel = F.to_date(F.lit(SCD2_SENTINEL_DATE))
    return grouped.select(
        key_col,
        attr_col,
        "valid_from",
        F.coalesce(
            F.lead("valid_from").over(w_seq), sentinel
        ).alias("valid_to"),
        "n_rows",
        F.lead("valid_from").over(w_seq).isNull().alias("is_current"),
    )


def scd2_intervals_sql(
    source_sql: str,
    key_col: str,
    attr_col: str,
    time_col: str,
    tie_col: str,
) -> str:
    """DuckDB twin of :func:`scd2_intervals` — identical windows and
    tie-breaks; n_rows CAST to BIGINT (count is bigint on both, the cast
    is belt-and-braces against engine type drift)."""
    return f"""
WITH ev AS (
  -- NULLS FIRST pins DuckDB's default (NULLS LAST) to Spark's window
  -- default (NULLS FIRST) so NULL event times island identically
  SELECT {key_col}, {attr_col}, {time_col}, {tie_col},
         row_number() OVER (PARTITION BY {key_col}
                            ORDER BY {time_col} NULLS FIRST,
                                     {tie_col} NULLS FIRST)
         - row_number() OVER (PARTITION BY {key_col}, {attr_col}
                              ORDER BY {time_col} NULLS FIRST,
                                       {tie_col} NULLS FIRST) AS __island
  FROM ({source_sql})
), isl AS (
  SELECT {key_col}, {attr_col}, __island,
         min({time_col}) AS valid_from,
         CAST(count(*) AS BIGINT) AS n_rows
  FROM ev GROUP BY {key_col}, {attr_col}, __island
)
SELECT {key_col}, {attr_col}, valid_from,
       coalesce(lead(valid_from) OVER w, DATE '{SCD2_SENTINEL_DATE}')
         AS valid_to,
       n_rows,
       lead(valid_from) OVER w IS NULL AS is_current
FROM isl
WINDOW w AS (PARTITION BY {key_col}
             ORDER BY valid_from NULLS FIRST, {attr_col} NULLS FIRST)
"""
