"""Salted skew-resistant aggregation: exactness vs the unsalted plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.operators.skew import salted_agg, salted_count_distinct
from vectordb_etl_spark.plans.inspect import count_exchanges


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (90% of rows), repeated values within keys, some NULLs
    rows = [(i, "hot" if i % 10 else "cold", i % 37 if i % 11 else None) for i in range(1000)]
    return spark.createDataFrame(rows, "row_id long, k string, v int").repartition(8)


def test_salted_count_distinct_exact(skewed):
    expected = {
        r["k"]: r["n"]
        for r in skewed.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    for num_salts in (1, 4, 64):
        got = {
            r["k"]: r["distinct_v"]
            for r in salted_count_distinct(skewed, ["k"], "v", num_salts=num_salts).collect()
        }
        assert got == expected, f"num_salts={num_salts}"


def test_salted_count_distinct_two_phase_plan(skewed):
    # two aggregation exchanges on top of the fixture's repartition; the
    # value-hash salt appears in the phase-1 grouping key, so no exchange
    # carries raw value rows partitioned by the group key alone
    out = salted_count_distinct(skewed, ["k"], "v", num_salts=16)
    assert count_exchanges(out) == 3
    assert "pmod(hash(v" in out._jdf.queryExecution().executedPlan().toString()


def test_salted_agg_matches_unsalted(skewed):
    df = skewed.withColumn("x", F.col("row_id").cast("double"))
    got = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"], round(r["mean"], 9))
        for r in salted_agg(
            df,
            ["k"],
            {
                "n": ("x", "count"),
                "total": ("x", "sum"),
                "lo": ("x", "min"),
                "hi": ("x", "max"),
                "mean": ("x", "avg"),
            },
            num_salts=8,
        ).collect()
    }
    expected = {
        r["k"]: (r["n"], r["total"], r["lo"], r["hi"], round(r["mean"], 9))
        for r in df.groupBy("k")
        .agg(
            F.count("x").alias("n"),
            F.sum("x").alias("total"),
            F.min("x").alias("lo"),
            F.max("x").alias("hi"),
            F.avg("x").alias("mean"),
        )
        .collect()
    }
    assert got == expected


def test_salted_count_distinct_keeps_all_null_groups(spark):
    # a group whose values are ALL NULL must appear with count 0, exactly
    # like groupBy().agg(countDistinct(v)) — filtering nulls pre-groupBy
    # would silently drop the key from the output
    df = spark.createDataFrame(
        [("a", 1), ("a", None), ("b", None), ("b", None)], "k string, v int"
    )
    expected = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    got = {
        r["k"]: r["distinct_v"]
        for r in salted_count_distinct(df, ["k"], "v", num_salts=4).collect()
    }
    assert got == expected == {"a": 1, "b": 0}


def test_salted_agg_rejects_non_decomposable(skewed):
    with pytest.raises(ValueError, match="non-decomposable"):
        salted_agg(skewed, ["k"], {"m": ("v", "median")})


def test_approx_distinct_within_rsd(spark):
    from vectordb_etl_spark.operators.skew import approx_distinct

    df = spark.range(0, 60000).selectExpr(
        "CAST(id % 3 AS STRING) AS k", "CAST(id AS STRING) AS v"
    )
    exact = {
        r["k"]: r["n"]
        for r in df.groupBy("k").agg(F.count_distinct("v").alias("n")).collect()
    }
    approx = {
        r["k"]: r["a"]
        for r in approx_distinct(df, ["k"], "v", rsd=0.05, out_name="a").collect()
    }
    for k, n in exact.items():
        assert abs(approx[k] - n) / n < 0.15  # 3x the 5% rsd, generous


def test_approx_percentile_close_to_exact(spark):
    # the approximate twin of the A1 median (quality.py uses
    # percentile_approx already — this pins its error against the exact
    # percentile on a known distribution)
    df = spark.range(0, 50000).selectExpr("CAST(id AS DOUBLE) AS x")
    row = df.agg(
        F.percentile_approx("x", 0.5).alias("ap"),
        F.expr("percentile(x, 0.5)").alias("ex"),
    ).first()
    assert abs(row["ap"] - row["ex"]) / row["ex"] < 0.01


def test_salted_join_matches_plain_join(spark):
    from vectordb_etl_spark.operators.skew import salted_join

    fact = spark.createDataFrame(
        [(7 if i % 10 else i % 5, i) for i in range(5000)], ["k", "v"]
    )
    dim = spark.createDataFrame([(i, f"d{i}") for i in range(10)], ["k", "w"])
    plain = {(r["k"], r["v"], r["w"]) for r in fact.join(dim, "k").collect()}
    salted = {
        (r["k"], r["v"], r["w"])
        for r in salted_join(fact, dim, "k", num_salts=8).collect()
    }
    assert salted == plain
    # left join keeps unmatched fact rows exactly once
    dim_partial = dim.filter(F.col("k") < 3)
    plain_l = sorted(
        (r["k"], r["v"], r["w"]) for r in fact.join(dim_partial, "k", "left").collect()
    )
    salted_l = sorted(
        (r["k"], r["v"], r["w"])
        for r in salted_join(fact, dim_partial, "k", num_salts=8, how="left").collect()
    )
    assert salted_l == plain_l


def test_salted_join_spreads_hot_key(spark):
    from vectordb_etl_spark.operators.skew import salted_join

    fact = spark.createDataFrame([(7, i) for i in range(1000)], ["k", "v"])
    dim = spark.createDataFrame([(7, "hot")], ["k", "w"])
    out = salted_join(fact, dim, "k", num_salts=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan  # the shuffle key includes the salt
    assert out.count() == 1000


def test_skew_report_flags_hot_key_and_matches_duckdb(spark):
    import duckdb

    from vectordb_etl_spark.operators.skew import skew_report, skew_report_sql

    # 1 hot key with 900 rows, 100 cold keys with 1 row each
    rows = [("hot", i) for i in range(900)] + [
        (f"k{i}", i) for i in range(100)
    ]
    df = spark.createDataFrame(rows, ["k", "x"])
    rep = skew_report(df, ["k"], top_n=5, skew_factor=8).collect()
    assert rep[0]["key"] == "hot" and rep[0]["n"] == 900
    assert rep[0]["share_ppm"] == (1_000_000 * 900) // 1000
    # mean load = 1000/101 ≈ 9.9; hot ratio ≈ 90.9x -> salted
    assert rep[0]["salt_recommended"] > 0
    assert all(r["salt_recommended"] == 0 for r in rep[1:])

    con = duckdb.connect()
    vals = ", ".join(f"('{k}', {x})" for k, x in rows)
    want = con.execute(
        skew_report_sql(
            f"SELECT * FROM (VALUES {vals}) t(k, x)", ["k"],
            top_n=5, skew_factor=8,
        )
    ).fetchall()
    assert [tuple(r) for r in rep] == want


def test_skew_report_null_keys_and_multi_column(spark):
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from vectordb_etl_spark.operators.skew import skew_report

    schema = StructType(
        [StructField("a", StringType()), StructField("b", LongType())]
    )
    rows = [(None, 1)] * 5 + [("x", 2)] * 3
    df = spark.createDataFrame(rows, schema)
    rep = {r["key"]: r["n"] for r in skew_report(df, ["a", "b"]).collect()}
    assert rep == {"\x1f1": 5, "x\x1f2": 3}
