"""Time rollup operators: multi-grain one-pass aggregates + sliding window."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.operators.rollup import sliding_window_agg, time_rollup


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        (1, "2024-03-05 10:05:00", "click", 1.0),
        (2, "2024-03-05 10:45:00", "click", 3.0),
        (3, "2024-03-05 11:05:00", "click", 5.0),
        (4, "2024-03-06 09:00:00", "view", 7.0),
    ]
    return (
        spark.createDataFrame(rows, "event_id long, ts_s string, event_type string, value double")
        .withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    )


def test_time_rollup_grains(events):
    out = time_rollup(
        events, group_cols=["event_type"], grains=("hour", "day"),
        aggs={"n": F.count("*"), "total": F.sum("value")},
    ).collect()
    got = {(r["grain"], str(r["bucket_ts"]), r["event_type"]): (r["n"], r["total"]) for r in out}
    assert got[("hour", "2024-03-05 10:00:00", "click")] == (2, 4.0)
    assert got[("hour", "2024-03-05 11:00:00", "click")] == (1, 5.0)
    assert got[("day", "2024-03-05 00:00:00", "click")] == (3, 9.0)
    assert got[("day", "2024-03-06 00:00:00", "view")] == (1, 7.0)
    # every grain's totals sum to the same grand total
    for g in ("hour", "day"):
        assert sum(v[1] for k, v in got.items() if k[0] == g) == 16.0


def test_time_rollup_single_shuffle(events):
    out = time_rollup(events, grains=("minute", "hour", "day"))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 1


def test_time_rollup_rejects_bad_grain(events):
    with pytest.raises(ValueError):
        time_rollup(events, grains=("fortnight",))


def test_sliding_window_agg(events):
    out = sliding_window_agg(events, window_seconds=3600).collect()
    by_id = {
        (r["event_type"], str(r["ts"])): (r["moving_avg"], r["window_n"]) for r in out
    }
    # 10:45 click sees 10:05 (40 min earlier) → avg(1,3)=2, n=2
    assert by_id[("click", "2024-03-05 10:45:00")] == (2.0, 2)
    # 11:05 click sees 10:45 and 10:05 (exactly 3600 s earlier, inclusive)
    assert by_id[("click", "2024-03-05 11:05:00")] == (3.0, 3)
    assert by_id[("view", "2024-03-06 09:00:00")] == (7.0, 1)


def test_sliding_window_agg_negative_values_floor_like_duckdb(spark):
    """Negative frame sums: BOTH Spark's DIV and DuckDB's integer //
    truncate toward zero, which breaks the half-up identity
    floor((2S+n)/(2n)) for negative sums (e.g. avg -2/3 would "round" to
    0). The operator floors via the pmod identity; the oracle must state
    the same floor via the mod identity — this pins both."""
    import duckdb

    rows = [
        ("a", "2024-03-05 10:00:00", -1.0),
        ("a", "2024-03-05 10:10:00", -2.0),
        ("a", "2024-03-05 10:20:00", -0.0000015),
        ("b", "2024-03-05 10:00:00", -7.0),
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    got = {
        (r["event_type"], str(r["ts"])): r["moving_avg"]
        for r in sliding_window_agg(df, window_seconds=3600).collect()
    }
    con = duckdb.connect()
    oracle = con.execute(
        """
        SELECT event_type, ts,
          CAST(((2 * s + n) - (((2 * s + n) % (2 * n) + 2 * n) % (2 * n)))
               // (2 * n) AS DOUBLE) / 1000000.0 AS moving_avg
        FROM (
          SELECT event_type, ts,
            sum(CAST(round(value * 1000000.0) AS BIGINT)) OVER w AS s,
            count(*) OVER w AS n
          FROM (VALUES
            ('a', TIMESTAMP '2024-03-05 10:00:00', -1.0),
            ('a', TIMESTAMP '2024-03-05 10:10:00', -2.0),
            ('a', TIMESTAMP '2024-03-05 10:20:00', -0.0000015),
            ('b', TIMESTAMP '2024-03-05 10:00:00', -7.0)
          ) AS t(event_type, ts, value)
          WINDOW w AS (
            PARTITION BY event_type ORDER BY epoch_us(ts)
            RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        )
        """
    ).fetchall()
    for event_type, ts, avg in oracle:
        assert got[(event_type, str(ts))] == avg, (event_type, ts)


def test_conversion_funnel_ordered_first_occurrences(spark):
    # the funnel counts users by ORDERED first occurrences, not mere
    # presence: user 1 converts fully; user 2 purchased BEFORE clicking
    # (drops at the purchase stage); user 3 never signed up (counts
    # nowhere); user 4 signs up then views, nothing more.
    import __spark_entry__ as e
    from pyspark.sql import functions as F

    rows = [
        (1, "signup", "2024-01-01 09:00:00"),
        (1, "view", "2024-01-01 09:05:00"),
        (1, "click", "2024-01-01 09:06:00"),
        (1, "purchase", "2024-01-01 09:10:00"),
        (2, "signup", "2024-01-01 08:00:00"),
        (2, "view", "2024-01-01 08:10:00"),
        (2, "purchase", "2024-01-01 08:15:00"),   # before first click
        (2, "click", "2024-01-01 08:20:00"),
        (3, "view", "2024-01-01 07:00:00"),
        (3, "purchase", "2024-01-01 07:30:00"),
        (4, "signup", "2024-01-01 06:00:00"),
        (4, "view", "2024-01-01 06:30:00"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, event_type string, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s")).drop("ts_s")
    # drive the registered query body directly on the crafted frame
    orig = e._events
    try:
        e._events = lambda spark_, sf_: ev
        got = e._conversion_funnel(spark, "unused").collect()[0]
    finally:
        e._events = orig
    assert got["signed_up"] == 3           # users 1, 2, 4
    assert got["viewed_after_signup"] == 3
    assert got["clicked_after_view"] == 2  # users 1, 2
    assert got["purchased_after_click"] == 1  # only user 1 is ordered


def test_robust_anomalies_flags_spike_not_baseline(spark):
    """A 10x spike flags; the (inflated-mean trap) baseline days do not;
    constant series flag nothing; matches DuckDB bit-for-bit."""
    import duckdb

    from vectordb_etl_spark.operators.rollup import (
        robust_anomalies,
        robust_anomalies_sql,
    )

    rows = (
        [("a", d, 100 + (d % 3)) for d in range(10)]  # stable around 100
        + [("a", 10, 1000)]                            # spike
        + [("b", d, 50) for d in range(5)]             # constant
    )
    df = spark.createDataFrame(rows, ["t", "day", "n"])
    out = robust_anomalies(df, "t", "day", "n").collect()
    flags = {(r["t"], r["day"]): r["is_anomaly"] for r in out}
    assert flags[("a", 10)] is True
    assert not any(v for (t, d), v in flags.items() if t == "a" and d < 10)
    assert not any(v for (t, d), v in flags.items() if t == "b")

    con = duckdb.connect()
    vals = ", ".join(f"('{t}', {d}, {n})" for t, d, n in rows)
    want = sorted(
        con.execute(
            robust_anomalies_sql(
                f"SELECT * FROM (VALUES {vals}) t(t, day, n)", "t", "day", "n"
            )
        ).fetchall()
    )
    assert sorted(map(tuple, out)) == want


def test_robust_anomalies_rejects_float_values(spark):
    import pytest

    from vectordb_etl_spark.operators.rollup import robust_anomalies

    df = spark.createDataFrame([("a", 1, 1.5)], ["t", "day", "n"])
    with pytest.raises(ValueError, match="integral value column"):
        robust_anomalies(df, "t", "day", "n")


def test_ewma_int_hand_computed(spark):
    from vectordb_etl_spark.operators.rollup import ewma_int

    rows = [("a", 1, 100), ("a", 2, 0), ("a", 3, 40), ("b", 1, 8)]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = {
        (r["k"], r["t"]): r["ewma"]
        for r in ewma_int(df, ["k"], "t", "x").collect()
    }
    # s1=100; s2=(0+3*100)//4=75; s3=(40+3*75)//4=66
    assert got == {("a", 1): 100, ("a", 2): 75, ("a", 3): 66, ("b", 1): 8}


def test_ewma_int_matches_duckdb(spark):
    import duckdb

    from vectordb_etl_spark.operators.rollup import ewma_int, ewma_int_sql

    rows = [
        ("k%d" % (i % 3), i // 3, (i * 37) % 101 - 17) for i in range(60)
    ]
    df = spark.createDataFrame(rows, ["k", "t", "x"])
    got = sorted(
        map(tuple, ewma_int(df, ["k"], "t", "x", num=2, den=5).collect())
    )
    con = duckdb.connect()
    con.register("src", df.toPandas())
    want = sorted(
        map(
            tuple,
            con.execute(
                ewma_int_sql("SELECT * FROM src", ["k"], "t", "x", num=2, den=5)
            ).fetchall(),
        )
    )
    assert got == want


def test_ewma_int_rejects_bad_alpha(spark):
    import pytest as _pytest

    from vectordb_etl_spark.operators.rollup import ewma_int

    df = spark.createDataFrame([("a", 1, 1)], ["k", "t", "x"])
    with _pytest.raises(ValueError):
        ewma_int(df, ["k"], "t", "x", num=4, den=4)


def test_global_cumsum_matches_single_window(spark):
    from pyspark.sql import Window, functions as F

    from vectordb_etl_spark.operators.rollup import global_cumsum

    # mixed-sign values, duplicate sort values (key tiebreaker), many
    # partitions so the offsets phase actually fires
    rows = [(i, (i * 37) % 11 - 5) for i in range(500)]
    df = spark.createDataFrame(rows, "k bigint, v bigint")
    got = {
        r["k"]: r["cum"]
        for r in global_cumsum(
            df, [F.desc("v"), F.asc("k")], "v", num_partitions=7
        ).collect()
    }
    w = Window.orderBy(F.desc("v"), F.asc("k")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    want = {
        r["k"]: r["cum"]
        for r in df.withColumn("cum", F.sum("v").over(w)).collect()
    }
    assert got == want


def test_global_cumsum_no_global_single_partition_window(spark):
    from pyspark.sql import functions as F

    from vectordb_etl_spark.operators.rollup import global_cumsum

    df = spark.createDataFrame([(i, i) for i in range(100)], "k bigint, v bigint")
    out = global_cumsum(df, [F.asc("k")], "v", num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # the big-side window is keyed by the range-partition id; the only
    # unkeyed window runs over the <=num_partitions totals
    assert "partitionBy=[__pid]" in plan.replace(" ", "") or "__pid" in plan
