"""HyperLogLog sketch — cross-engine parity, mergeability, accuracy."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_etl_spark.functions.sketches import (
    hll_distinct,
    hll_distinct_sql,
    hll_merge,
    hll_registers,
    hll_registers_sql,
)


def test_hll_registers_match_duckdb_bit_for_bit(spark):
    """Same md5/bucket/rank arithmetic on both engines — the register
    table (the sketch itself) is identical, not just the estimate."""
    df = spark.range(500).select(F.col("id").alias("v"))
    regs = sorted(
        map(tuple, hll_registers(df, "v", p=8).collect())
    )
    con = duckdb.connect()
    dregs = sorted(
        con.execute(
            hll_registers_sql("SELECT range AS v FROM range(500)", "v", p=8)
        ).fetchall()
    )
    assert regs == dregs


def test_hll_estimate_matches_duckdb_and_is_accurate(spark):
    """Estimate parity on real data + raw-HLL error bound in the valid
    zone (n >= 2.5 m): distinct orderkeys per returnflag at sf0.01 are in
    the thousands against m=256."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    out = {
        r["l_returnflag"]: (r["n_buckets_used"], r["hll_est"])
        for r in hll_distinct(li, "l_orderkey", ["l_returnflag"]).collect()
    }
    exact = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag")
        .agg(F.countDistinct("l_orderkey").alias("n"))
        .collect()
    }
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMALL}/lineitem.parquet'"
    )
    dout = {
        r[0]: (r[1], r[2])
        for r in con.execute(
            hll_distinct_sql(
                "SELECT * FROM lineitem", "l_orderkey", ["l_returnflag"]
            )
        ).fetchall()
    }
    assert out == dout
    for mode, n in exact.items():
        assert n >= 640, "fixture regressed below the raw-HLL valid zone"
        est = out[mode][1]
        assert abs(est - n) / n < 0.2, (mode, est, n)


def test_hll_merge_equals_whole(spark):
    """max-merge of per-split registers == registers of the union — the
    property that lets per-partition/per-day sketches roll up without
    touching raw data."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    whole = sorted(
        map(tuple, hll_registers(li, "l_orderkey", ["l_returnflag"]).collect())
    )
    h1 = hll_registers(
        li.filter(F.col("l_linenumber") % 2 == 0), "l_orderkey", ["l_returnflag"]
    )
    h2 = hll_registers(
        li.filter(F.col("l_linenumber") % 2 == 1), "l_orderkey", ["l_returnflag"]
    )
    merged = sorted(
        map(tuple, hll_merge(h1.unionByName(h2), ["l_returnflag"]).collect())
    )
    assert whole == merged


def test_hll_ignores_nulls_and_rejects_tiny_p(spark):
    from pyspark.sql.types import LongType, StructField, StructType

    df = spark.createDataFrame(
        [(1,), (2,), (None,), (None,)],
        StructType([StructField("v", LongType())]),
    )
    regs = hll_registers(df, "v", p=8)
    assert regs.count() == 2  # one register per non-null value here
    with pytest.raises(ValueError, match="m >= 128"):
        hll_distinct(df, "v", p=4)


def test_hll_plan_shape(spark):
    """Two exchanges (bucket agg, group agg), zero Python — the sketch
    must stay whole-stage-codegen JVM work."""
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    out = hll_distinct(li, "l_orderkey", ["l_returnflag"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") <= 2
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
