"""Inverted term index — correctness vs scan, partition pruning, add()."""

from pyspark.sql import functions as F

from tests.conftest import SF_TINY
from vectordb_etl_spark.store.inverted import InvertedIndex, tokenize_col


def _scan_ids(docs, term):
    return {
        r["doc_id"]
        for r in docs.filter(
            F.array_contains(tokenize_col("text"), term.lower())
        ).collect()
    }


def test_lookup_matches_full_scan_and_prunes(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    idx = InvertedIndex(spark, str(tmp_path / "inv")).build(docs)
    for term in ("shuffle", "window", "ZZZ-not-present"):
        got = {r["doc_id"] for r in idx.lookup(docs, term).collect()}
        assert got == _scan_ids(docs, term), term
    # the postings read reaches the scan as ONE partition filter
    plan = (
        idx.postings("window")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    frag = plan.split("PartitionFilters")[1][:160]
    assert "term_bucket" in frag


def test_case_insensitive_and_bucket_stability(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    idx = InvertedIndex(spark, str(tmp_path / "inv2")).build(docs)
    a = {r["doc_id"] for r in idx.lookup(docs, "Window").collect()}
    b = {r["doc_id"] for r in idx.lookup(docs, "window").collect()}
    assert a == b and a
    # python-side bucket matches the column expression's partitioning:
    # the pruned read found rows, so the bucket route is consistent
    assert idx.postings("window").count() == len(a)


def test_add_extends_index_segment_style(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    first = docs.filter(F.col("doc_id") < 250)
    rest = docs.filter(F.col("doc_id") >= 250)
    idx = InvertedIndex(spark, str(tmp_path / "inv3")).build(first)
    before = idx.postings("window").count()
    idx.add(rest)
    after = {r["doc_id"] for r in idx.lookup(docs, "window").collect()}
    assert after == _scan_ids(docs, "window")
    assert len(after) >= before
