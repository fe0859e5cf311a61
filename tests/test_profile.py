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
