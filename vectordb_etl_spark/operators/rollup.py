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


def robust_anomalies(
    df: DataFrame,
    group_col: str,
    bucket_col: str,
    value_col: str,
    k_half: int = 3,
) -> DataFrame:
    """Median/MAD robust anomaly flags per (group, bucket) value — the
    ingest-monitoring primitive ("did today's count for this type jump?")
    that a mean/stddev z-score gets wrong whenever the anomaly itself
    inflates the baseline. A point is anomalous when
    ``|x - median| > k_half * MAD`` (k_half=3 ≈ the classic 3-MAD rule).

    Exactness stance: medians of INTEGER values land on .0 or .5, so
    everything runs ×2/×4 scaled in bigints — ``med2 = 2·median(x)``,
    ``dev2 = |2x - med2|``, ``mad4 = 2·median(dev2)`` — and the flag is
    the pure-integer comparison ``2·dev2 > k_half·mad4``. Bit-identical
    on any engine (DuckDB twin: :func:`robust_anomalies_sql`); a
    constant series (MAD=0) flags only true deviators, not everything.

    Scale shape: two tiny per-group aggregates (groups × 1 rows)
    broadcast back onto the bucket table — the big table shuffles once
    on the group key; medians are exact percentile aggregates, not
    approximations, because the per-group cardinality here is buckets
    (days), not raw rows."""
    vt = dict(df.dtypes).get(value_col)
    if vt not in ("tinyint", "smallint", "int", "bigint", "long"):
        # the ×2/×4 scaling is exact ONLY for integer values (medians of
        # ints land on .0/.5); a double column would silently lose the
        # bit-exactness contract — refuse loudly, quantize upstream
        raise ValueError(
            f"robust_anomalies needs an integral value column; {value_col} "
            f"is {vt} — quantize to micro-units first"
        )
    med = df.groupBy(group_col).agg(
        (F.expr(f"percentile({value_col}, 0.5)") * 2)
        .cast("bigint")
        .alias("__med2")
    )
    dev = df.join(F.broadcast(med), group_col).withColumn(
        "__dev2",
        F.abs(F.col(value_col) * 2 - F.col("__med2")).cast("bigint"),
    )
    mad = dev.groupBy(group_col).agg(
        (F.expr("percentile(__dev2, 0.5)") * 2).cast("bigint").alias("__mad4")
    )
    return (
        dev.join(F.broadcast(mad), group_col)
        .select(
            group_col,
            bucket_col,
            F.col(value_col),
            F.col("__med2"),
            F.col("__mad4"),
            (F.col("__dev2") * 2 > F.lit(k_half) * F.col("__mad4")).alias(
                "is_anomaly"
            ),
        )
    )


def robust_anomalies_sql(
    source_sql: str,
    group_col: str,
    bucket_col: str,
    value_col: str,
    k_half: int = 3,
) -> str:
    """DuckDB twin — ``quantile_cont`` interpolates medians exactly like
    Spark's ``percentile``; the rest is the identical ×2/×4 integer
    arithmetic."""
    return f"""
WITH src AS MATERIALIZED ({source_sql}),
med AS (
  SELECT {group_col},
         CAST(quantile_cont({value_col}, 0.5) * 2 AS BIGINT) AS med2
  FROM src GROUP BY {group_col}
), dev AS (
  SELECT src.*, med.med2,
         CAST(abs(src.{value_col} * 2 - med.med2) AS BIGINT) AS dev2
  FROM src JOIN med USING ({group_col})
), mad AS (
  SELECT {group_col},
         CAST(quantile_cont(dev2, 0.5) * 2 AS BIGINT) AS mad4
  FROM dev GROUP BY {group_col}
)
SELECT dev.{group_col}, dev.{bucket_col}, dev.{value_col},
       dev.med2 AS __med2, mad.mad4 AS __mad4,
       dev.dev2 * 2 > {k_half} * mad.mad4 AS is_anomaly
FROM dev JOIN mad USING ({group_col})
"""


def ewma_int(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    num: int = 1,
    den: int = 4,
) -> DataFrame:
    """Integer EWMA per key: ``s₁ = x₁; sₜ = (num·xₜ + (den−num)·sₜ₋₁) DIV den``
    (α = num/den; default ¼ — a ~7-step memory, the ingest-monitor
    smoother). Defined over INTEGER inputs with floor division so the
    recursion is bit-exact on any engine — float EWMA is order-sensitive
    in the last ulp and can't be hash-checked; callers quantize to
    micro-units first (the house rule).

    Execution shape: a recursive fold has no window-function form, but the
    per-key series is small (days, not rows), so each key's ordered values
    are collected into ONE array and folded with ``aggregate()`` — a
    whole-stage-codegen JVM expression, no Python hop, no iteration
    lineage. One shuffle (the groupBy on the key), then map-only explode
    back to rows. At 100 TB the pre-aggregation to (key, period) grain has
    already shrunk the data by orders of magnitude; the arrays are bounded
    by the series length per key (guard: this operator is for rolled-up
    series — do not feed raw event rows).

    Returns the input columns plus ``ewma`` (bigint). DuckDB twin:
    :func:`ewma_int_sql` (recursive CTE over row_number — engines may
    differ in HOW they fold, only the result is compared).
    """
    if not (0 < num < den):
        raise ValueError(f"need 0 < num < den; got {num}/{den}")
    packed = df.groupBy(*key_cols).agg(
        F.array_sort(
            F.collect_list(F.struct(F.col(order_col), F.col(value_col)))
        ).alias("series")
    )
    rest = den - num
    folded = packed.withColumn(
        "states",
        F.expr(
            f"""
            aggregate(
              series,
              CAST(array() AS ARRAY<BIGINT>),
              (acc, e) -> CASE WHEN size(acc) = 0
                   THEN array(CAST(e.{value_col} AS BIGINT))
                   ELSE concat(acc, array(
                        ({num} * CAST(e.{value_col} AS BIGINT)
                         + {rest} * element_at(acc, -1)) DIV {den})) END)
            """
        ),
    )
    return folded.select(
        *key_cols,
        F.expr(
            f"inline(zip_with(series, states, "
            f"(e, s) -> struct(e.{order_col} AS {order_col}, "
            f"e.{value_col} AS {value_col}, s AS ewma)))"
        ),
    )


def ewma_int_sql(
    source_sql: str,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    num: int = 1,
    den: int = 4,
) -> str:
    """DuckDB twin of :func:`ewma_int`: the same integer recursion as a
    recursive CTE over per-key row_number (DuckDB folds row-at-a-time
    where Spark folds an array — identical results, hash-compared)."""
    if not (0 < num < den):
        raise ValueError(f"need 0 < num < den; got {num}/{den}")
    keys = ", ".join(key_cols)
    rest = den - num
    return f"""
WITH RECURSIVE ewma_src AS MATERIALIZED (
  SELECT {keys}, {order_col}, CAST({value_col} AS BIGINT) AS v,
         row_number() OVER (PARTITION BY {keys} ORDER BY {order_col}) AS rn
  FROM ({source_sql})),
ewma_fold AS (
  SELECT {keys}, {order_col}, v, rn, v AS ewma FROM ewma_src WHERE rn = 1
  UNION ALL
  SELECT s.{keys.replace(', ', ', s.')}, s.{order_col}, s.v, s.rn,
         ({num} * s.v + {rest} * f.ewma) // {den} AS ewma
  FROM ewma_src s JOIN ewma_fold f
    ON s.rn = f.rn + 1 AND {' AND '.join(f's.{k} = f.{k}' for k in key_cols)})
SELECT {keys}, {order_col}, v AS {value_col}, CAST(ewma AS BIGINT) AS ewma
FROM ewma_fold"""


def global_cumsum(
    df: DataFrame,
    order_cols: list,
    value_col: str,
    out_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Running sum over a GLOBAL total order without the single-partition
    window (`Window.orderBy(...)` with no partition key moves the whole
    relation through one task — fine for bounded key spaces like
    calendar days, a scale-killer when the ordered set grows with the
    data, e.g. a cumulative share over a dimension table). The classic
    two-phase parallel prefix sum instead:

      1. ``repartitionByRange`` on the order — ranges are contiguous, so
         every partition holds an interval of the total order;
      2. within-partition running sums (window PARTITIONED by the range
         partition id — parallel);
      3. per-partition totals (≤ num_partitions rows) get their own
         tiny cumulative pass and broadcast back as offsets.

    Exact for integer/decimal ``value_col`` (the arithmetic regroups but
    never reorders additions of exact types — callers summing floats
    would lose order-determinism, so don't). ``order_cols`` must be a
    TOTAL order (add a key tiebreaker) — equal-rank rows landing in
    different range partitions would otherwise make within-partition
    ranks ambiguous."""
    from pyspark.sql import Window as _W

    parts = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(parts, *order_cols).withColumn(
        "__pid", F.spark_partition_id()
    )
    w_in = (
        _W.partitionBy("__pid")
        .orderBy(*order_cols)
        .rowsBetween(_W.unboundedPreceding, 0)
    )
    within = ranged.withColumn("__run", F.sum(value_col).over(w_in))
    # partition total = plain sum (NOT max of the running column — with
    # negative values the running sum is not monotone)
    totals = ranged.groupBy("__pid").agg(F.sum(value_col).alias("__tot"))
    w_tot = _W.orderBy("__pid").rowsBetween(
        _W.unboundedPreceding, -1
    )  # ≤ num_partitions rows — the single-partition window is bounded here
    offsets = totals.withColumn(
        "__off", F.coalesce(F.sum("__tot").over(w_tot), F.lit(0))
    ).select("__pid", "__off")
    return (
        within.join(F.broadcast(offsets), "__pid")
        .withColumn(out_col, F.col("__run") + F.col("__off"))
        .drop("__pid", "__run", "__off")
    )
