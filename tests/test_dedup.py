"""Dedup suite tests: MinHash/LSH recall on planted near-dups, Jaccard
exactness, SimHash blocking exactness, embedding pair search."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.operators import dedup as D


@pytest.fixture(scope="module")
def near_dup_docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again " * 5
    rows = [
        (1, base),
        (2, base.replace("lazy", "sleepy")),  # near-dup of 1
        (3, "completely different words about spark query engines here " * 5),
        (4, base),  # exact dup of 1
        (5, "short text"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_shingles_short_text_empty(spark):
    df = spark.createDataFrame([("one two",)], ["text"])
    out = df.select(D.word_shingles_col("text", 3).alias("s")).head()["s"]
    assert out == []


def test_minhash_identical_docs_identical_signatures(near_dup_docs):
    sig = near_dup_docs.select(
        "doc_id", D.minhash_signature_col("text", 8).alias("s")
    ).collect()
    by_id = {r["doc_id"]: r["s"] for r in sig}
    assert by_id[1] == by_id[4]
    assert by_id[1] != by_id[3]


def test_lsh_finds_planted_near_dups(near_dup_docs):
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(near_dup_docs, num_hashes=8, bands=4).collect()
    }
    assert (1, 4) in pairs  # exact dup always collides
    assert (1, 2) in pairs or (2, 4) in pairs  # high-jaccard near-dup caught
    assert (1, 3) not in pairs


def test_jaccard_exact_values(near_dup_docs):
    rows = D.ngram_jaccard_pairs(near_dup_docs, threshold=0.05).collect()
    vals = {(r["id_a"], r["id_b"]): r["jaccard"] for r in rows}
    assert vals[(1, 4)] == 1.0
    assert 0.3 < vals[(1, 2)] < 1.0
    assert (1, 3) not in vals


def test_near_dup_dedup_keeps_first(near_dup_docs):
    pairs = D.ngram_jaccard_pairs(near_dup_docs, threshold=0.5)
    kept = sorted(
        r["doc_id"] for r in D.near_dup_dedup(near_dup_docs, pairs).collect()
    )
    assert 1 in kept and 4 not in kept  # smaller id survives


def test_simhash_blocking_matches_bruteforce(spark, docs_tiny):
    docs = docs_tiny.limit(60)
    blocked = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in D.simhash_near_dup_pairs(docs, bits=32, max_hamming=3).collect()
    }
    fp = docs.select("doc_id", D.simhash_col("text", 32).alias("fp"))
    a = fp.select(F.col("doc_id").alias("id_a"), F.col("fp").alias("fa"))
    b = fp.select(F.col("doc_id").alias("id_b"), F.col("fp").alias("fb"))
    brute = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", D.hamming_col("fa", "fb", 32).alias("hamming"))
        .filter(F.col("hamming") <= 3)
        .collect()
    }
    assert blocked == brute


def test_embedding_topk_pairs(embeddings_tiny):
    rows = D.embedding_topk_pairs(embeddings_tiny, k=5).collect()
    assert len(rows) == 5
    cos = [r["cosine"] for r in rows]
    assert cos == sorted(cos, reverse=True)
    assert all(r["id_a"] < r["id_b"] for r in rows)
