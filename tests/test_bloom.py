"""Bloom build/prune/semi-join: exactness, no false negatives, pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from vectordb_etl_spark.operators.bloom import (
    bloom_build,
    bloom_prune,
    bloom_semi_join,
)


def test_no_false_negatives_and_exact_semi(spark):
    dim = spark.createDataFrame(
        [(i * 3,) for i in range(200)], ["k"]
    )  # members: multiples of 3
    fact = spark.createDataFrame(
        [(i, f"r{i}") for i in range(600)], ["k", "payload"]
    )
    got = sorted(
        r["k"]
        for r in bloom_semi_join(fact, dim, "k", "k", m_bits=1024).collect()
    )
    want = sorted(i for i in range(600) if i % 3 == 0)
    assert got == want


def test_prune_keeps_all_members(spark):
    # the bloom guarantee under test: member keys ALWAYS survive pruning
    dim = spark.createDataFrame([(f"key{i}",) for i in range(500)], ["k"])
    bloom = bloom_build(dim, "k", m_bits=512)  # deliberately tiny -> FPs
    survivors = {
        r["k"] for r in bloom_prune(dim, "k", bloom, m_bits=512).collect()
    }
    assert survivors == {f"key{i}" for i in range(500)}


def test_prune_actually_prunes(spark):
    dim = spark.createDataFrame([(i,) for i in range(50)], ["k"])
    fact = spark.createDataFrame([(i,) for i in range(50, 5050)], ["k"])
    bloom = bloom_build(dim, "k", m_bits=4096)
    n = bloom_prune(fact, "k", bloom, m_bits=4096).count()
    # disjoint keys: everything surviving is a false positive; with
    # 50 keys in 4096 bits the FP rate is well under 10%
    assert n < 500


def test_bitmap_bounded_and_mergeable(spark):
    from vectordb_etl_spark.operators.bloom import bloom_merge

    a = spark.createDataFrame([(i,) for i in range(100)], ["k"])
    b = spark.createDataFrame([(i,) for i in range(100, 200)], ["k"])
    ba, bb = bloom_build(a, "k", m_bits=256), bloom_build(b, "k", m_bits=256)
    assert ba.count() <= 5  # ceil(256 / 63) = 5 words max
    merged = bloom_merge(ba, bb)
    whole = bloom_build(a.unionByName(b), "k", m_bits=256)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # idempotence: re-merging one side changes nothing (replay safety)
    again = bloom_merge(merged, ba)
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_build_matches_duckdb_bit_for_bit(spark):
    import duckdb

    from vectordb_etl_spark.operators.bloom import bloom_build_sql

    dim = spark.createDataFrame(
        [(i * 7,) for i in range(300)] + [(None,)], "k bigint"
    )
    got = sorted(map(tuple, bloom_build(dim, "k", m_bits=1024, k=3).collect()))
    sql = bloom_build_sql(
        "SELECT (x - 1) * 7 AS k FROM range(1, 301) t(x) "
        "UNION ALL SELECT NULL",
        "k",
        m_bits=1024,
        k=3,
    )
    want = sorted(map(tuple, duckdb.connect().execute(sql).fetchall()))
    assert got == want


def test_null_keys_ignored(spark):
    dim = spark.createDataFrame([(1,), (None,)], "k int")
    fact = spark.createDataFrame([(1,), (2,), (None,)], "k int")
    got = [r["k"] for r in bloom_semi_join(fact, dim, "k", "k").collect()]
    assert got == [1]


def test_prune_plan_broadcasts_words(spark):
    dim = spark.createDataFrame([(i,) for i in range(64)], ["k"])
    fact = spark.createDataFrame([(i,) for i in range(1000)], ["k"])
    plan = (
        bloom_prune(fact, "k", bloom_build(dim, "k"), m_bits=4096)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
