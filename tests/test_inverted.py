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


def test_bm25_hand_computed(spark, tmp_path):
    # 3 docs, query 'cat': tf=2 in d1 (dl=4), tf=1 in d2 (dl=2); d3 none.
    rows = [
        (1, "cat cat dog bird"),
        (2, "cat fish"),
        (3, "dog dog dog"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = InvertedIndex(spark, str(tmp_path / "bm")).build_ranked(docs)
    got = {r["id"]: r["score_micro"] for r in idx.bm25_topk("cat").collect()}
    # N=3, L=9, A=9//3=3; df(cat)=2; idf = (2*(3-2)+1)//(2*2+1) path:
    # c = ((1e6*44*3*tf) // (20*3*tf + 6*3 + 18*dl)) * 3 // 5
    c1 = ((1_000_000 * 44 * 3 * 2) // (20 * 3 * 2 + 18 + 18 * 4)) * 3 // 5
    c2 = ((1_000_000 * 44 * 3 * 1) // (20 * 3 * 1 + 18 + 18 * 2)) * 3 // 5
    assert got == {1: c1, 2: c2}
    assert c1 > c2  # higher tf, same term -> higher score


def test_bm25_rare_term_outweighs_common(spark, tmp_path):
    # 'rare' in 1 doc, 'common' in all: the rare-term doc must lead a
    # two-term query even with equal tf/dl.
    rows = [(i, "common filler words here") for i in range(1, 9)]
    rows.append((9, "rare filler words here"))
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = InvertedIndex(spark, str(tmp_path / "bm2")).build_ranked(docs)
    top = idx.bm25_topk("rare common", k=3).collect()
    assert top[0]["id"] == 9


def test_bm25_matches_duckdb_fuzz(spark, tmp_path):
    import duckdb

    from vectordb_etl_spark.store.inverted import bm25_topk_sql

    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    rows = [
        (
            i,
            " ".join(
                vocab[(i * 7 + j * j) % len(vocab)]
                for j in range((i * 13) % 9 + 1)
            ),
        )
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    idx = InvertedIndex(spark, str(tmp_path / "bm3")).build_ranked(docs)
    got = sorted(
        map(tuple, idx.bm25_topk("beta epsilon", k=40).collect())
    )
    con = duckdb.connect()
    con.register("corpus", docs.toPandas())
    want = sorted(
        map(
            tuple,
            con.execute(
                bm25_topk_sql(
                    "SELECT * FROM corpus", ["beta", "epsilon"], 40
                )
            ).fetchall(),
        )
    )
    assert got == want


def test_bm25_postings_read_is_pruned(spark, tmp_path):
    docs = spark.read.parquet(f"{SF_TINY}/documents.parquet")
    idx = InvertedIndex(spark, str(tmp_path / "bm4")).build_ranked(docs)
    plan = (
        idx.bm25_topk("window shuffle")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan
    assert "term_bucket" in plan.split("PartitionFilters")[1][:200]
