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


def test_sq8_roundtrip_error_bound(spark):
    # |x - dequant(quant(x))| <= step/2 = (max-min)/510 per element, and
    # codes store as real 1-byte TINYINTs
    import pyspark.sql.functions as F

    from vectordb_etl_spark.functions.vector import (
        sq8_dequantize_col,
        sq8_quantize_col,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    q = emb.select(
        "embedding", sq8_quantize_col("embedding").alias("q8")
    ).withColumn("deq", sq8_dequantize_col("q8"))
    assert q.schema["q8"].dataType["codes"].dataType.simpleString() == "array<tinyint>"
    err = q.select(
        F.max(
            F.aggregate(
                F.zip_with(
                    F.col("embedding").cast("array<double>"),
                    "deq",
                    lambda a, b: F.abs(a - b),
                ),
                F.lit(0.0),
                lambda acc, x: F.greatest(acc, x),
            )
            - F.col("q8.step") / 2 * 1.0000001  # fp slack on the bound itself
        ).alias("excess")
    ).first()["excess"]
    assert err <= 0


def test_sq8_constant_vector(spark):
    from vectordb_etl_spark.functions.vector import (
        sq8_dequantize_col,
        sq8_quantize_col,
    )

    df = spark.createDataFrame([([1.5] * 4,)], "embedding array<double>")
    row = df.select(
        sq8_dequantize_col(sq8_quantize_col("embedding")).alias("d")
    ).first()
    assert row["d"] == [1.5, 1.5, 1.5, 1.5]


def test_sq8_topk_recall_vs_exact(spark):
    import __spark_entry__ as entrymod
    from vectordb_etl_spark.operators.ann import recall_at_k

    sf = "/root/testdata/sf0.001"
    exact = [r["vec_id"] for r in entrymod.queries()["vector_topk"](spark, sf).collect()]
    sq8 = [r["vec_id"] for r in entrymod.queries()["sq8_topk"](spark, sf).collect()]
    assert recall_at_k(exact, sq8) >= 0.9
