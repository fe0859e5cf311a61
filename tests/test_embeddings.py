"""Embedder tests E1–E3: determinism, normalization, UDF harness."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import functions as F

from vectordb_etl_spark.config import EmbeddingConfig
from vectordb_etl_spark.embeddings import (
    HashEmbedder,
    get_embedder,
    query_vector,
    with_embeddings,
)


def test_hash_embedder_deterministic():
    e = HashEmbedder(dimension=64)
    a = e.embed_query("hello")
    b = e.embed_query("hello")
    c = e.embed_query("world")
    assert a == b
    assert a != c
    assert len(a) == 64


def test_hash_embedder_normalized():
    e = HashEmbedder(dimension=1024)
    v = np.array(e.embed_query("text"))
    assert math.isclose(np.linalg.norm(v), 1.0, rel_tol=1e-5)


def test_embed_udf_matches_driver(spark):
    cfg = EmbeddingConfig(dimension=32)
    df = spark.createDataFrame([("alpha",), ("beta",)], ["text"])
    rows = {r["text"]: r["embedding"] for r in with_embeddings(df, config=cfg).collect()}
    e = get_embedder(cfg)
    for t in ("alpha", "beta"):
        expected = e.embed_query(t)
        got = rows[t]
        assert np.allclose(got, expected, atol=1e-6)


def test_query_vector_shape():
    v = query_vector("질문", EmbeddingConfig(dimension=16))
    assert len(v) == 16
