"""Z-order layout — key parity with DuckDB, locality, and file pruning."""

import duckdb
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL
from vectordb_etl_spark.store.layout import (
    zorder_exact_layout,
    zorder_key_exact_col,
    zorder_key_exact_sql,
)


def test_zorder_key_matches_duckdb_bit_for_bit(spark):
    df = spark.range(512).select(
        F.col("id").alias("a"), (F.col("id") * 37 % 512).alias("b")
    )
    got = [
        r["z"]
        for r in df.select(zorder_key_exact_col(["a", "b"], bits=9).alias("z"))
        .orderBy("a")
        .collect()
    ]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            f"SELECT {zorder_key_exact_sql(['a', 'b'], bits=9)} AS z FROM ("
            "SELECT range AS a, range * 37 % 512 AS b FROM range(512)"
            ") ORDER BY a"
        ).fetchall()
    ]
    assert got == want


def test_zorder_key_is_morton_interleave():
    """Known Morton values: (a=1,b=0)->1, (a=0,b=1)->2, (a=3,b=5)->39."""
    import pyspark.sql

    spark = pyspark.sql.SparkSession.getActiveSession()
    df = spark.createDataFrame([(1, 0), (0, 1), (3, 5)], ["a", "b"])
    got = [
        r["z"]
        for r in df.select(zorder_key_exact_col(["a", "b"], bits=4).alias("z")).collect()
    ]
    # interleave: z = sum bit_j(a)<<(2j) | bit_j(b)<<(2j+1)
    assert got == [1, 2, 0b100111]


def test_zorder_rejects_bad_shapes():
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key_exact_col(["a"])
    with pytest.raises(ValueError, match="> 62"):
        zorder_key_exact_col(["a", "b", "c", "d"], bits=16)
    with pytest.raises(ValueError, match="at least 2"):
        zorder_key_exact_sql(["a"])


def test_zorder_layout_tightens_file_stats_and_prunes(spark, tmp_path):
    """The lakehouse payoff: after Z-order, per-file min/max boxes of
    BOTH dimensions are tight, so a box predicate's candidate-file set
    (the manifest-prune arithmetic) shrinks vs insert order."""
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet").select(
        "o_orderkey",
        (F.col("o_custkey") % 1024).alias("ck"),
        (F.dayofyear("o_orderdate")).alias("dy"),
    )
    base = str(tmp_path / "plain")
    zord = str(tmp_path / "zorder")
    orders.repartition(8).write.parquet(base)
    zorder_exact_layout(orders, ["ck", "dy"], bits=10, num_files=8).write.parquet(
        zord
    )

    from vectordb_etl_spark.store.layout import (
        file_stats_manifest,
        prune_candidate_files,
    )

    def candidate_files(path, box):
        manifest = file_stats_manifest(spark, path, ["ck", "dy"])
        return prune_candidate_files(manifest, box).count(), manifest.count()

    box = {"ck": (100, 200), "dy": (50, 100)}
    plain_hit, plain_total = candidate_files(base, box)
    z_hit, z_total = candidate_files(zord, box)
    # insert order: every file spans the full range -> nothing prunes
    assert plain_hit == plain_total
    # z-order: the box intersects a strict minority of files
    assert z_hit < z_total
    # and the data itself is unchanged
    a = spark.read.parquet(base).orderBy("o_orderkey").collect()
    b = spark.read.parquet(zord).orderBy("o_orderkey").collect()
    assert a == b


def test_manifest_rowcounts_and_full_range_box(spark, tmp_path):
    """Manifest n_rows sums to the table; an all-covering box keeps every
    file; an impossible box keeps none."""
    from vectordb_etl_spark.store.layout import (
        file_stats_manifest,
        prune_candidate_files,
    )

    df = spark.range(1000).select(
        F.col("id").alias("a"), (F.col("id") % 97).alias("b")
    )
    p = str(tmp_path / "t")
    df.repartition(4).write.parquet(p)
    man = file_stats_manifest(spark, p, ["a", "b"])
    assert man.agg(F.sum("n_rows")).collect()[0][0] == 1000
    assert prune_candidate_files(man, {"a": (0, 2000)}).count() == man.count()
    assert prune_candidate_files(man, {"a": (5000, 6000)}).count() == 0
    # multi-column: both conditions must intersect
    assert (
        prune_candidate_files(man, {"a": (0, 2000), "b": (500, 600)}).count()
        == 0
    )


def test_file_bloom_manifest_prunes_point_lookups(spark, tmp_path):
    from vectordb_etl_spark.store.layout import (
        bloom_prune_files,
        file_bloom_manifest,
    )

    # 8 files of disjoint key ranges; keys are HIGH-cardinality and the
    # layout is hash-ish per file, so a point lookup should hit ~1 file
    p = str(tmp_path / "t")
    df = spark.range(8000).select(F.col("id").alias("k"))
    df.repartitionByRange(8, "k").write.parquet(p)
    man = file_bloom_manifest(spark, p, "k", m_bits=65536, k=3)
    n_files = man.select("file").distinct().count()
    assert n_files == 8
    # no false negatives: for any member key, the file holding it survives
    survivors = bloom_prune_files(man, [4242], m_bits=65536, k=3)
    holder = (
        spark.read.parquet(p)
        .where(F.col("k") == 4242)
        .select(F.input_file_name().alias("file"))
        .distinct()
    )
    assert holder.join(survivors, "file").count() == 1
    # pruning: at 65536 bits / ~1000 keys per file the FP rate is tiny,
    # so a point probe touches far fewer than all 8 files
    assert survivors.count() <= 2
    # absent key: every survivor (if any) is a false positive — bounded
    assert bloom_prune_files(man, [999_999], m_bits=65536, k=3).count() <= 2


def test_file_bloom_manifest_guards(spark, tmp_path):
    import pytest as _pt

    from vectordb_etl_spark.store.layout import (
        bloom_prune_files,
        file_bloom_manifest,
    )

    p = str(tmp_path / "t2")
    spark.range(10).select(F.col("id").alias("k")).write.parquet(p)
    with _pt.raises(ValueError, match="m_bits"):
        file_bloom_manifest(spark, p, "k", m_bits=10)
    man = file_bloom_manifest(spark, p, "k")
    with _pt.raises(ValueError, match="keys"):
        bloom_prune_files(man, [])
