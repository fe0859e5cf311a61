"""Incremental aggregate maintenance (operators/incremental.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.operators.incremental import (
    aggregate_state,
    merge_states,
)

MEASURES = {
    "n": ("count", "v"),
    "s": ("sum", "v"),
    "lo": ("min", "v"),
    "hi": ("max", "v"),
}


def _rows(spark, data):
    return spark.createDataFrame(data, ["k", "v"])


def test_merge_equals_one_shot(spark):
    # keys in both batches, keys exclusive to each, and repeated values
    old = _rows(spark, [("a", 1), ("a", 5), ("b", 2), ("c", 7)])
    new = _rows(spark, [("a", 3), ("c", 7), ("d", -4)])
    merged = merge_states(
        aggregate_state(old, ["k"], MEASURES),
        aggregate_state(new, ["k"], MEASURES),
        ["k"],
        MEASURES,
    )
    oneshot = aggregate_state(old.unionByName(new), ["k"], MEASURES)
    got = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in merged.collect()}
    want = {r["k"]: (r["n"], r["s"], r["lo"], r["hi"]) for r in oneshot.collect()}
    assert got == want
    # the count-merge trap: count must ADD across batches, not re-count rows
    assert got["a"] == (3, 9, 1, 5)
    assert got["d"] == (1, -4, -4, -4)


def test_merge_is_associative_over_three_batches(spark):
    b1 = _rows(spark, [("x", 10), ("y", 1)])
    b2 = _rows(spark, [("x", -2)])
    b3 = _rows(spark, [("y", 4), ("z", 0)])
    s1 = aggregate_state(b1, ["k"], MEASURES)
    s2 = aggregate_state(b2, ["k"], MEASURES)
    s3 = aggregate_state(b3, ["k"], MEASURES)
    left = merge_states(merge_states(s1, s2, ["k"], MEASURES), s3, ["k"], MEASURES)
    right = merge_states(s1, merge_states(s2, s3, ["k"], MEASURES), ["k"], MEASURES)
    assert sorted(map(tuple, left.collect())) == sorted(map(tuple, right.collect()))


def test_unsupported_op_raises(spark):
    df = _rows(spark, [("a", 1)])
    with pytest.raises(ValueError, match="unsupported op"):
        aggregate_state(df, ["k"], {"m": ("avg", "v")})
