"""One-pass per-column profiling: stats parity, canonicalization, guards."""

from pyspark.sql import functions as F

from vectordb_etl_spark.operators.profile import profile_table


def _sample(spark):
    rows = [
        (1, "a", 1.25, None),
        (2, "b", -0.5, None),
        (2, None, 2.0, None),
        (None, "a", None, None),
    ]
    return spark.createDataFrame(
        rows, "k bigint, s string, x double, dead string"
    )


def test_profile_counts_and_reprs(spark):
    got = {r["column"]: r for r in profile_table(_sample(spark)).collect()}
    assert set(got) == {"k", "s", "x", "dead"}
    for r in got.values():
        assert r["n_rows"] == 4
    assert (got["k"]["n_nulls"], got["k"]["n_distinct"]) == (1, 2)
    assert (got["s"]["n_nulls"], got["s"]["n_distinct"]) == (1, 2)
    assert got["k"]["min_repr"] == "1" and got["k"]["max_repr"] == "2"
    # float min/max are micro-units: -0.5 -> -500000, 2.0 -> 2000000
    assert got["x"]["min_repr"] == "-500000"
    assert got["x"]["max_repr"] == "2000000"
    # all-null column: zero distinct, NULL reprs
    assert (got["dead"]["n_nulls"], got["dead"]["n_distinct"]) == (4, 0)
    assert got["dead"]["min_repr"] is None


def test_profile_matches_independent_aggregates(spark):
    df = _sample(spark)
    got = {r["column"]: r for r in profile_table(df, ["k", "s"]).collect()}
    for c in ("k", "s"):
        want = df.agg(
            F.count_distinct(c).alias("d"),
            (F.count(F.lit(1)) - F.count(c)).alias("n"),
        ).first()
        assert got[c]["n_distinct"] == want["d"]
        assert got[c]["n_nulls"] == want["n"]


def test_profile_single_scan_plan(spark):
    df = _sample(spark)
    plan = (
        profile_table(df)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the whole profile is one aggregate over one scan (multi-distinct
    # rides a single Expand), not a job per column
    assert plan.count("Scan ExistingRDD") == 1
    assert "Expand" in plan
    assert "BatchEvalPython" not in plan


def test_profile_rejects_unknown_columns(spark):
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown columns"):
        profile_table(_sample(spark), ["k", "nope"])


def test_equi_depth_histogram_uniform_depths(spark):
    from vectordb_etl_spark.operators.profile import equi_depth_histogram

    # 0..99 in 4 buckets: 25 rows each, contiguous extents, NULL skipped
    rows = [(float(i),) for i in range(100)] + [(None,)]
    df = spark.createDataFrame(rows, "v double")
    got = equi_depth_histogram(df, "v", buckets=4).collect()
    assert [r["bucket"] for r in got] == [0, 1, 2, 3]
    assert [r["n"] for r in got] == [25, 25, 25, 25]
    assert got[0]["lo_micro"] == 0
    assert got[3]["hi_micro"] == 99_000_000


def test_equi_depth_histogram_skew_still_bounded(spark):
    from vectordb_etl_spark.operators.profile import equi_depth_histogram

    # 90% of mass on one hot value: equi-depth collapses the hot value
    # into few buckets but NEVER produces more than `buckets` rows
    rows = [(5.0,)] * 900 + [(float(i),) for i in range(100)]
    df = spark.createDataFrame(rows, "v double")
    got = equi_depth_histogram(df, "v", buckets=5).collect()
    assert len(got) <= 5
    assert sum(r["n"] for r in got) == 1000


def test_equi_depth_histogram_matches_duckdb(spark):
    import duckdb

    from vectordb_etl_spark.operators.profile import (
        equi_depth_histogram,
        equi_depth_histogram_sql,
    )

    vals = [((i * 37) % 101 + i / 7.0,) for i in range(500)]
    df = spark.createDataFrame(vals, "v double")
    got = sorted(map(tuple, equi_depth_histogram(df, "v", 7).collect()))
    con = duckdb.connect()
    con.execute(
        "CREATE TABLE t AS SELECT (i * 37) % 101 + i / 7.0 AS v "
        "FROM range(500) r(i)"
    )
    want = sorted(map(tuple, con.execute(
        equi_depth_histogram_sql("t", "v", 7)
    ).fetchall()))
    assert got == want


def test_equi_depth_histogram_rejects_bad_buckets(spark):
    import pytest as _pt

    from vectordb_etl_spark.operators.profile import (
        equi_depth_histogram,
        equi_depth_histogram_sql,
    )

    df = spark.createDataFrame([(1.0,)], "v double")
    with _pt.raises(ValueError, match="buckets"):
        equi_depth_histogram(df, "v", buckets=1)
    with _pt.raises(ValueError, match="buckets"):
        equi_depth_histogram_sql("t", "v", buckets=0)


def test_pearson_corr_ppm_known_values(spark):
    from vectordb_etl_spark.operators.profile import pearson_corr_ppm

    # perfect positive: y = 2x -> corr_ppm = 1_000_000 (floor exact)
    df = spark.createDataFrame(
        [(float(i), float(2 * i)) for i in range(50)], "x double, y double"
    )
    row = pearson_corr_ppm(df, "x", "y", x_scale=1, y_scale=1).first()
    assert row["n"] == 50 and row["corr_ppm"] == 1_000_000
    # perfect negative
    df2 = spark.createDataFrame(
        [(float(i), float(-3 * i)) for i in range(50)], "x double, y double"
    )
    assert pearson_corr_ppm(df2, "x", "y", 1, 1).first()["corr_ppm"] == -1_000_000


def test_pearson_corr_ppm_degenerate_and_nulls(spark):
    from vectordb_etl_spark.operators.profile import pearson_corr_ppm

    # constant x: zero variance -> NULL; NULL pairs dropped from n
    df = spark.createDataFrame(
        [(1.0, 2.0), (1.0, 5.0), (None, 9.0), (1.0, None)],
        "x double, y double",
    )
    row = pearson_corr_ppm(df, "x", "y", 1, 1).first()
    assert row["n"] == 2 and row["corr_ppm"] is None


def test_pearson_corr_ppm_matches_numpy_sign_and_magnitude(spark):
    import numpy as np

    from vectordb_etl_spark.operators.profile import pearson_corr_ppm

    xs = [(i * 17) % 23 + 0.25 * i for i in range(200)]
    ys = [((i * 11) % 19) - 0.1 * i for i in range(200)]
    df = spark.createDataFrame(
        list(zip(map(float, xs), map(float, ys))), "x double, y double"
    )
    got = pearson_corr_ppm(df, "x", "y", x_scale=100, y_scale=100).first()
    want = np.corrcoef(
        np.round(np.array(xs) * 100), np.round(np.array(ys) * 100)
    )[0, 1]
    assert abs(got["corr_ppm"] / 1e6 - want) < 2e-6


def test_ols_slope_known_lines(spark):
    from vectordb_etl_spark.operators.profile import ols_slope_ppm

    rows = [("up", i, 3 * i + 7) for i in range(20)] + [
        ("down", i, 100 - 2 * i) for i in range(20)
    ] + [("flat", i, 5) for i in range(20)] + [("one", 1, 9)]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    got = {
        r["g"]: (r["n"], r["slope_ppm"])
        for r in ols_slope_ppm(df, "x", "y", ["g"]).collect()
    }
    assert got["up"] == (20, 3_000_000)
    assert got["down"] == (20, -2_000_000)
    assert got["flat"] == (20, 0)
    assert got["one"] == (1, None)  # degenerate: single x


def test_ols_slope_matches_duckdb(spark):
    import duckdb

    from vectordb_etl_spark.operators.profile import (
        ols_slope_ppm,
        ols_slope_ppm_sql,
    )

    rows = [("a", i, (i * 13) % 29) for i in range(50)] + [
        ("b", i, 200 - (i * 7) % 31) for i in range(50)
    ]
    df = spark.createDataFrame(rows, "g string, x bigint, y bigint")
    got = sorted(map(tuple, ols_slope_ppm(df, "x", "y", ["g"]).collect()))
    src = "SELECT * FROM (VALUES " + ", ".join(
        f"('{g}', {x}, {y})" for g, x, y in rows
    ) + ") t(g, x, y)"
    want = sorted(map(tuple, duckdb.connect().execute(
        ols_slope_ppm_sql(src, "x", "y", ["g"])
    ).fetchall()))
    assert got == want
