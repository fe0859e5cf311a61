"""Distributed Bloom-filter build + pre-shuffle semi-join pruning.

Beyond-reference tier (no counterpart in gudwls215/vectordb-etl — its
joins are row-Python over collected lists): the 100 TB join problem this
solves is the mid-size dimension — too big to broadcast RAW (100M keys ×
8 B ≈ a GB), yet its Bloom bitmap at ~10 bits/key is a few hundred MB of
*words*, and a selective one prunes most fact rows BEFORE the shuffle
that the exact semi join needs. Spark's own runtime row-level filtering
does this internally but is planner-triggered and opaque; this operator
is the explicit, testable form: the bitmap is a (word, bits) DataFrame —
buildable by ordinary aggregation at any scale, broadcastable in words
(m/63 rows), mergeable by bit_or (union of key sets), persistable as
parquet like every other index tier in this package.

Everything is integer md5 double-hashing (Kirsch–Mitzenhenner style:
h_j = (h1 + j·h2) mod m, h2 forced odd), the same portable-hash recipe
as functions/sketches.py — no JVM-private state, so the construction is
engine-portable and the no-false-negative property is directly testable.

The PRUNE is an optimization, never a semantics change: callers follow
it with the exact semi join (`bloom_semi_join` does both), so a false
positive costs only wasted shuffle rows and the result stays exact — a
plain IN-subquery oracle must hash-match.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX = 15  # 60-bit hash budget, exact under bigint (see sketches.py)


def _hash_cols(key: Column, m_bits: int, k: int) -> list[Column]:
    """k bit positions for one key: h1/h2 split of one 60-bit md5 hash,
    h_j = (h1 + j·h2) mod m with h2 odd so the stride visits all
    positions for power-of-two m."""
    h = F.conv(F.substring(F.md5(key.cast("string")), 1, _HEX), 16, 10).cast(
        "bigint"
    )
    h1 = h % (1 << 30)
    h2 = F.shiftright(h, 30).bitwiseOR(F.lit(1))
    return [((h1 + F.lit(j) * h2) % m_bits).cast("bigint") for j in range(k)]


def bloom_build(
    dim: DataFrame, key_col: str, m_bits: int = 4096, k: int = 2
) -> DataFrame:
    """Build the bitmap as a ``(word, bits)`` table: position p sets bit
    ``p mod 63`` of word ``p div 63``; one explode + one
    map-side-combined bit_or aggregation, ≤ ceil(m/63) rows out
    regardless of dim size. Words carry 63 bits, not 64: bit 63 is the
    bigint sign bit, and ``1 << 63`` is an overflow ERROR in DuckDB (vs
    Java wraparound in Spark) — staying below it keeps the bitmap
    bit-identical cross-engine, which is what lets a persisted or
    stream-maintained bloom be hash-checked against
    :func:`bloom_build_sql`. NULL keys contribute nothing (they never
    match an equi join anyway)."""
    if m_bits < 63:
        raise ValueError(f"m_bits must be >= 63; got {m_bits}")
    key = F.col(key_col)
    pos = F.explode(F.array(*_hash_cols(key, m_bits, k))).alias("pos")
    return (
        dim.where(key.isNotNull())
        .select(pos)
        .select(
            F.expr("pos DIV 63").alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 63 AS INT))").alias("b"),
        )
        .groupBy("word")
        .agg(F.bit_or("b").alias("bits"))
    )


def bloom_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Union of the key sets behind two same-(m, k) blooms: word-wise
    bit_or. Commutative, associative, and IDEMPOTENT (or of an or), so
    re-merging the same batch is absorbed for free — the property the
    streaming ingest (streaming/ingest.py:bloom_ingest_stream) leans on
    for replay safety."""
    return (
        a.unionByName(b).groupBy("word").agg(F.bit_or("bits").alias("bits"))
    )


def bloom_build_sql(
    source_sql: str, key_col: str, m_bits: int = 4096, k: int = 2
) -> str:
    """DuckDB twin of :func:`bloom_build` — the identical md5
    double-hash, position, and 63-bit word arithmetic, so the (word,
    bits) table hash-matches the Spark build bit-for-bit."""
    if m_bits < 63:
        raise ValueError(f"m_bits must be >= 63; got {m_bits}")
    h = (
        f"CAST('0x' || substring(md5(CAST({key_col} AS VARCHAR)), 1, "
        f"{_HEX}) AS BIGINT)"
    )
    probes = ", ".join(
        f"(h % 1073741824 + {j} * ((h // 1073741824) | 1)) % {m_bits}"
        for j in range(k)
    )
    return f"""
WITH hashed AS (
  SELECT {h} AS h FROM ({source_sql}) WHERE {key_col} IS NOT NULL),
pos AS (SELECT unnest([{probes}]) AS pos FROM hashed)
SELECT pos // 63 AS word,
       bit_or(CAST(1 AS BIGINT) << CAST(pos % 63 AS INTEGER)) AS bits
FROM pos GROUP BY pos // 63"""


def bloom_prune(
    fact: DataFrame,
    key_col: str,
    bloom: DataFrame,
    m_bits: int = 4096,
    k: int = 2,
) -> DataFrame:
    """Drop fact rows whose key is definitely not in the bloom — the
    map-side pre-shuffle filter. Each of the k probes is a BROADCAST
    join against the word table (m/63 rows) + a bit test; rows missing
    their word or bit are eliminated. No false negatives: every key the
    bloom was built from survives (tested property). Output column set
    is unchanged."""
    out = fact
    key = F.col(key_col)
    for j, pos in enumerate(_hash_cols(key, m_bits, k)):
        w = bloom.select(
            F.col("word").alias(f"__bw{j}"), F.col("bits").alias(f"__bb{j}")
        )
        out = (
            out.withColumn(f"__bp{j}", pos)
            .join(
                F.broadcast(w),
                F.expr(f"__bp{j} DIV 63") == F.col(f"__bw{j}"),
            )
            .where(
                F.expr(
                    f"(shiftrightunsigned(__bb{j}, "
                    f"CAST(__bp{j} % 63 AS INT)) & 1) = 1"
                )
            )
            .drop(f"__bp{j}", f"__bw{j}", f"__bb{j}")
        )
    return out


def bloom_semi_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    m_bits: int = 4096,
    k: int = 2,
) -> DataFrame:
    """EXACT semi join with bloom pre-pruning: build the bitmap from the
    dim keys, prune the fact map-side, then run the ordinary left-semi
    join on the survivors. Result ≡ ``fact LEFT SEMI JOIN dim`` (the
    oracle states exactly that); the bloom only shrinks what the semi
    join's shuffle has to carry — at a 1% survivor rate that is a 100×
    smaller exchange on the fact side."""
    bloom = bloom_build(dim, dim_key, m_bits, k)
    pruned = bloom_prune(fact, fact_key, bloom, m_bits, k)
    keys = dim.select(F.col(dim_key).alias("__dk")).where(
        F.col("__dk").isNotNull()
    )
    return pruned.join(
        keys, F.col(fact_key) == F.col("__dk"), "left_semi"
    )
