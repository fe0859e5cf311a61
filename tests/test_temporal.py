"""As-of join and banded range join vs. brute-force ground truth."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.operators.temporal import asof_join, range_join, range_join_count


@pytest.fixture(scope="module")
def quotes(spark):
    rows = [
        (1, "2024-01-01 09:00:00", 100.0),
        (1, "2024-01-01 09:05:00", 101.0),
        (1, "2024-01-01 09:10:00", 102.0),
        (2, "2024-01-01 09:03:00", 50.0),
    ]
    return (
        spark.createDataFrame(rows, "sym long, ts_s string, px double")
        .withColumn("qts", F.to_timestamp("ts_s")).drop("ts_s")
    )


@pytest.fixture(scope="module")
def trades(spark):
    rows = [
        (1, "2024-01-01 09:04:59", 10),   # → quote 09:00 (100.0)
        (1, "2024-01-01 09:05:00", 20),   # → quote 09:05 exactly (<=) (101.0)
        (1, "2024-01-01 09:30:00", 30),   # → quote 09:10 (102.0)
        (2, "2024-01-01 09:02:00", 40),   # → before any quote → null
        (3, "2024-01-01 09:05:00", 50),   # key with no quotes → null
    ]
    return (
        spark.createDataFrame(rows, "sym long, ts_s string, qty int")
        .withColumn("tts", F.to_timestamp("ts_s")).drop("ts_s")
    )


def test_asof_join_semantics(quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts", right_cols=["px"]
    )
    got = {(r["sym"], r["qty"]): r["px"] for r in out.collect()}
    assert got[(1, 10)] == 100.0
    assert got[(1, 20)] == 101.0  # equal timestamps match (<=)
    assert got[(1, 30)] == 102.0
    assert got[(2, 40)] is None   # nothing at-or-before
    assert got[(3, 50)] is None   # key absent from right
    assert out.count() == trades.count()  # left join: no row loss


def test_asof_join_tolerance(quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        right_cols=["px"], tolerance_seconds=600,
    )
    got = {(r["sym"], r["qty"]): r["px"] for r in out.collect()}
    assert got[(1, 10)] == 100.0
    assert got[(1, 30)] is None  # 09:30 vs 09:10 = 20 min > 10-min tolerance


def test_range_join_matches_bruteforce(spark, quotes, trades):
    out = range_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        lower_seconds=0, upper_seconds=600,
    )
    got = {(r["sym"], r["qty"], r["px"]) for r in out.collect()}
    # brute force via cross-join filter
    brute = (
        trades.alias("t").join(quotes.alias("q"), F.col("t.sym") == F.col("q.sym"))
        .filter(
            (F.unix_timestamp("qts") - F.unix_timestamp("tts")).between(0, 600)
        )
        .select(F.col("t.sym"), "qty", "px")
    )
    expect = {(r["sym"], r["qty"], r["px"]) for r in brute.collect()}
    assert got == expect and got  # non-empty


def test_range_join_count(spark, quotes, trades):
    out = range_join_count(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts",
        lower_seconds=0, upper_seconds=600, group_cols=["sym", "qty"],
    )
    got = {(r["sym"], r["qty"]): r["n_matches"] for r in out.collect()}
    # trade (1, 10) at 09:04:59: quotes 09:05, 09:10 in (0,600] window → 2
    assert got[(1, 10)] == 2
    assert (3, 50) not in got  # inner semantics


def test_asof_plan_has_single_shuffle(quotes, trades):
    out = asof_join(
        trades, quotes, on="sym", left_ts="tts", right_ts="qts", right_cols=["px"]
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union-trick: exactly one Exchange (the window's hashpartitioning)
    assert plan.count("Exchange hashpartitioning") == 1


def test_scd2_intervals_islands_and_sentinel(spark):
    """A reopened attribute value starts a NEW interval (islands, not
    groups); intervals chain half-open per key; exactly one open
    interval carries the sentinel."""
    import datetime as dt

    from vectordb_etl_spark.operators.temporal import scd2_intervals

    d = dt.date
    rows = [
        # key 1: A A B A  -> three intervals (A reopens after B)
        (1, "A", d(2024, 1, 1), 1),
        (1, "A", d(2024, 1, 5), 2),
        (1, "B", d(2024, 2, 1), 3),
        (1, "A", d(2024, 3, 1), 4),
        # key 2: single event
        (2, "X", d(2024, 6, 1), 5),
    ]
    df = spark.createDataFrame(rows, ["k", "st", "d", "tie"])
    out = sorted(
        (r["k"], r["st"], r["valid_from"], r["valid_to"], r["n_rows"],
         r["is_current"])
        for r in scd2_intervals(df, "k", "st", "d", "tie").collect()
    )
    sentinel = d(9999, 12, 31)
    assert out == [
        (1, "A", d(2024, 1, 1), d(2024, 2, 1), 2, False),
        (1, "A", d(2024, 3, 1), sentinel, 1, True),
        (1, "B", d(2024, 2, 1), d(2024, 3, 1), 1, False),
        (2, "X", d(2024, 6, 1), sentinel, 1, True),
    ]
    # half-open chain: each key's intervals tile [first, sentinel)
    per_key = {}
    for k, _st, vf, vt, _n, _cur in out:
        per_key.setdefault(k, []).append((vf, vt))
    for k, spans in per_key.items():
        spans.sort()
        for (_, vt_prev), (vf_next, _) in zip(spans, spans[1:]):
            assert vt_prev == vf_next, (k, spans)


def test_scd2_intervals_matches_duckdb(spark):
    import duckdb

    from tests.conftest import SF_TINY
    from vectordb_etl_spark.operators.temporal import (
        scd2_intervals,
        scd2_intervals_sql,
    )

    o = spark.read.parquet(f"{SF_TINY}/orders.parquet").select(
        "o_custkey", "o_orderstatus",
        F.to_date("o_orderdate").alias("d"), "o_orderkey",
    )
    got = sorted(
        map(
            tuple,
            scd2_intervals(
                o, "o_custkey", "o_orderstatus", "d", "o_orderkey"
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW orders AS SELECT * FROM '{SF_TINY}/orders.parquet'"
    )
    want = sorted(
        con.execute(
            scd2_intervals_sql(
                "SELECT o_custkey, o_orderstatus, "
                "CAST(o_orderdate AS DATE) AS d, o_orderkey FROM orders",
                "o_custkey", "o_orderstatus", "d", "o_orderkey",
            )
        ).fetchall()
    )
    assert got == want


def test_scd2_null_time_islands_match_duckdb(spark):
    """NULL event times order NULLS FIRST on both engines (Spark's
    window default, pinned explicitly in the SQL twin — DuckDB defaults
    NULLS LAST and would island differently without the pin)."""
    import datetime as dt

    import duckdb

    from vectordb_etl_spark.operators.temporal import (
        scd2_intervals,
        scd2_intervals_sql,
    )

    from pyspark.sql.types import (
        DateType,
        IntegerType,
        StringType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("k", IntegerType()),
            StructField("st", StringType()),
            StructField("d", DateType()),
            StructField("tie", IntegerType()),
        ]
    )
    rows = [
        (1, "A", None, 1),
        (1, "B", dt.date(2024, 1, 2), 2),
        (1, "A", dt.date(2024, 2, 1), 3),
    ]
    df = spark.createDataFrame(rows, schema)
    skey = lambda r: tuple(str(x) for x in r)  # noqa: E731 (None vs date)
    got = sorted(
        map(tuple, scd2_intervals(df, "k", "st", "d", "tie").collect()),
        key=skey,
    )
    con = duckdb.connect()
    want = sorted(
        con.execute(
            scd2_intervals_sql(
                "SELECT * FROM (VALUES "
                "(1, 'A', NULL::DATE, 1), "
                "(1, 'B', DATE '2024-01-02', 2), "
                "(1, 'A', DATE '2024-02-01', 3)) t(k, st, d, tie)",
                "k", "st", "d", "tie",
            )
        ).fetchall(),
        key=skey,
    )
    assert got == want
