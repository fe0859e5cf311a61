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


def test_kmv_registers_match_duckdb_and_small_sets_exact(spark):
    from vectordb_etl_spark.functions.sketches import (
        kmv_estimate_cols,
        kmv_registers,
        kmv_registers_sql,
    )

    df = spark.range(1000).select(F.col("id").alias("v"))
    regs = kmv_registers(df, "v", k=128)
    got = [r["h"] for r in regs.collect()]
    con = duckdb.connect()
    want = [
        r[0]
        for r in con.execute(
            kmv_registers_sql("SELECT range AS v FROM range(1000)", "v", k=128)
        ).fetchall()
    ]
    assert sorted(got) == sorted(want) and len(got) == 128
    # under-k set: count is exact, estimator bypassed
    small = kmv_registers(spark.range(50).select(F.col("id").alias("v")), "v", k=128)
    est = small.agg(*kmv_estimate_cols(128)).collect()[0]
    assert est["n_regs"] == 50 and est["n_distinct_est"] == 50


def test_kmv_estimator_accuracy_and_jaccard(spark):
    """KMV n-distinct within ~3/sqrt(k); Jaccard of half-overlapping
    ranges lands near the true 1/3."""
    from vectordb_etl_spark.functions.sketches import (
        kmv_estimate_cols,
        kmv_jaccard,
        kmv_registers,
    )

    k = 256
    a = kmv_registers(
        spark.range(0, 20000).select(F.col("id").alias("v")), "v", k=k
    )
    b = kmv_registers(
        spark.range(10000, 30000).select(F.col("id").alias("v")), "v", k=k
    )
    est = a.agg(*kmv_estimate_cols(k)).collect()[0]
    assert abs(est["n_distinct_est"] - 20000) / 20000 < 0.25
    j = kmv_jaccard(a, b, k=k).collect()[0]
    # true J = 10000/30000 = 0.333...
    assert j["n_union_regs"] == k
    assert abs(j["jaccard_ppm"] - 333_333) < 120_000
    assert j["jaccard_ppm"] == (1_000_000 * j["n_both"]) // k


def test_kmv_merge_is_union_sketch(spark):
    from vectordb_etl_spark.functions.sketches import kmv_merge, kmv_registers

    a = kmv_registers(spark.range(0, 5000).select(F.col("id").alias("v")), "v", k=64)
    b = kmv_registers(
        spark.range(5000, 10000).select(F.col("id").alias("v")), "v", k=64
    )
    whole = kmv_registers(
        spark.range(0, 10000).select(F.col("id").alias("v")), "v", k=64
    )
    merged = kmv_merge(a, b, k=64)
    assert sorted(r["h"] for r in merged.collect()) == sorted(
        r["h"] for r in whole.collect()
    )


def test_kmv_rejects_tiny_k(spark):
    from vectordb_etl_spark.functions.sketches import (
        kmv_registers,
        kmv_registers_sql,
    )

    df = spark.range(10).select(F.col("id").alias("v"))
    with pytest.raises(ValueError, match="k must be"):
        kmv_registers(df, "v", k=1)
    with pytest.raises(ValueError, match="k must be"):
        kmv_registers_sql("SELECT 1 AS v", "v", k=0)


def test_cm_sketch_matches_duckdb_and_overestimates(spark):
    """Counters bit-match DuckDB; point estimates never UNDERcount (the
    CM guarantee) and hit exactly for values with no hash collisions."""
    from vectordb_etl_spark.functions.sketches import (
        cm_lookup,
        cm_sketch,
        cm_sketch_sql,
    )

    # skewed stream: value v occurs v times, v in 1..40
    rows = [(v,) for v in range(1, 41) for _ in range(v)]
    df = spark.createDataFrame(rows, ["v"])
    sk = cm_sketch(df, "v", d=4, w=64)
    got = sorted(map(tuple, sk.collect()))
    con = duckdb.connect()
    vals = ", ".join(f"({v})" for v, in rows)
    want = sorted(
        con.execute(
            cm_sketch_sql(f"SELECT * FROM (VALUES {vals}) t(v)", "v", d=4, w=64)
        ).fetchall()
    )
    assert got == want
    cands = spark.createDataFrame([(v,) for v in range(1, 41)], ["v"])
    est = {
        r["v"]: r["cm_est"]
        for r in cm_lookup(sk, cands, "v", d=4, w=64).collect()
    }
    for v in range(1, 41):
        assert est[v] >= v  # never undercounts
    # total mass per hash row is exact
    n = len(rows)
    per_row = sk.groupBy("row").agg(F.sum("cnt").alias("s")).collect()
    assert all(r["s"] == n for r in per_row)


def test_cm_merge_equals_whole_and_absent_is_zero(spark):
    from vectordb_etl_spark.functions.sketches import (
        cm_lookup,
        cm_merge,
        cm_sketch,
    )

    a = cm_sketch(spark.range(0, 500).select(F.col("id").alias("v")), "v", d=3, w=128)
    b = cm_sketch(
        spark.range(500, 1000).select(F.col("id").alias("v")), "v", d=3, w=128
    )
    whole = cm_sketch(spark.range(0, 1000).select(F.col("id").alias("v")), "v", d=3, w=128)
    merged = cm_merge(a, b)
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    # a value the sketch never saw can still collide, but an EMPTY sketch
    # gives 0
    empty = cm_sketch(
        spark.range(0).select(F.col("id").alias("v")), "v", d=3, w=128
    )
    cand = spark.createDataFrame([(123456789,)], ["v"])
    assert cm_lookup(empty, cand, "v", d=3, w=128).collect()[0]["cm_est"] == 0


def test_cm_lookup_keeps_candidate_columns(spark):
    """cm_lookup returns the candidate rows PLUS cm_est (the documented
    contract and cm_lookup_sql's `c.*, cm_est` shape) — extra candidate
    columns must survive and match the SQL twin."""
    from vectordb_etl_spark.functions.sketches import (
        cm_lookup,
        cm_lookup_sql,
        cm_sketch,
        cm_sketch_sql,
    )

    rows = [(v,) for v in range(1, 21) for _ in range(v)]
    df = spark.createDataFrame(rows, ["v"])
    sk = cm_sketch(df, "v", d=3, w=64)
    cands = spark.createDataFrame(
        [(5, "five", 5), (17, "seventeen", 17)], ["v", "name", "truth"]
    )
    got = sorted(
        map(tuple, cm_lookup(sk, cands, "v", d=3, w=64).collect())
    )
    assert all(len(r) == 4 for r in got)  # v, name, truth, cm_est
    vals = ", ".join(f"({v})" for v, in rows)
    want = sorted(
        duckdb.connect().execute(
            cm_lookup_sql(
                cm_sketch_sql(f"SELECT * FROM (VALUES {vals}) t(v)", "v", d=3, w=64),
                "SELECT * FROM (VALUES (5, 'five', 5), (17, 'seventeen', 17)) "
                "c(v, name, truth)",
                "v",
                d=3,
                w=64,
            )
        ).fetchall()
    )
    assert got == want
    # a NULL candidate value never equi-joins and was never counted, but
    # the ROW must survive with cm_est = 0 (one output row per candidate)
    null_cands = spark.createDataFrame(
        [(None, "missing")], "v int, name string"
    )
    null_row = cm_lookup(sk, null_cands, "v", d=3, w=64).collect()
    assert len(null_row) == 1
    assert null_row[0]["name"] == "missing" and null_row[0]["cm_est"] == 0


def test_cm_rejects_bad_shape(spark):
    import pytest as _pytest

    from vectordb_etl_spark.functions.sketches import cm_sketch, cm_sketch_sql

    df = spark.range(5).select(F.col("id").alias("v"))
    with _pytest.raises(ValueError, match="d >= 1"):
        cm_sketch(df, "v", d=0)
    with _pytest.raises(ValueError, match="d >= 1"):
        cm_sketch_sql("SELECT 1 AS v", "v", w=1)


def test_cm_join_size_estimates_and_overestimates(spark):
    """Inner-product estimate >= the true equi-join size (collision mass
    only adds); equals it with a collision-free width; disjoint key sets
    estimate small (0 without collisions)."""
    from vectordb_etl_spark.functions.sketches import cm_join_size, cm_sketch

    # A: key v appears v times (v in 1..20); B: each key once (1..10)
    a_rows = [(v,) for v in range(1, 21) for _ in range(v)]
    b_rows = [(v,) for v in range(1, 11)]
    true_size = sum(v for v in range(1, 11))  # 55
    A = spark.createDataFrame(a_rows, ["k"])
    B = spark.createDataFrame(b_rows, ["k"])
    d, w = 4, 1024  # wide enough: no collisions among 20 keys
    sa = cm_sketch(A, "k", d=d, w=w)
    sb = cm_sketch(B, "k", d=d, w=w)
    est = cm_join_size(sa, sb, d=d).collect()[0]["join_size_est"]
    assert est == true_size
    # narrow width: collisions can only push the estimate UP
    sa8 = cm_sketch(A, "k", d=2, w=8)
    sb8 = cm_sketch(B, "k", d=2, w=8)
    est8 = cm_join_size(sa8, sb8, d=2).collect()[0]["join_size_est"]
    assert est8 >= true_size
    # disjoint keys, wide sketch -> 0
    C = spark.createDataFrame([(v,) for v in range(1000, 1010)], ["k"])
    sc = cm_sketch(C, "k", d=d, w=w)
    assert cm_join_size(sa, sc, d=d).collect()[0]["join_size_est"] == 0


def test_cm_join_size_matches_duckdb(spark):
    import duckdb

    from vectordb_etl_spark.functions.sketches import (
        cm_join_size,
        cm_join_size_sql,
        cm_sketch,
        cm_sketch_sql,
    )

    a_rows = [(v % 7,) for v in range(50)]
    b_rows = [(v % 5,) for v in range(30)]
    A = spark.createDataFrame(a_rows, ["k"])
    B = spark.createDataFrame(b_rows, ["k"])
    got = cm_join_size(
        cm_sketch(A, "k", d=3, w=64), cm_sketch(B, "k", d=3, w=64), d=3
    ).collect()[0]["join_size_est"]
    con = duckdb.connect()
    va = ", ".join(f"({v})" for v, in a_rows)
    vb = ", ".join(f"({v})" for v, in b_rows)
    want = con.execute(
        cm_join_size_sql(
            cm_sketch_sql(f"SELECT * FROM (VALUES {va}) t(k)", "k", d=3, w=64),
            cm_sketch_sql(f"SELECT * FROM (VALUES {vb}) t(k)", "k", d=3, w=64),
            d=3,
        )
    ).fetchall()[0][0]
    assert got == want
    # sanity: the true join size for v%7 x v%5 keys
    from collections import Counter

    ca, cb = Counter(v for v, in a_rows), Counter(v for v, in b_rows)
    true = sum(ca[k] * cb[k] for k in ca)
    assert got >= true


# -- Misra-Gries heavy hitters -------------------------------------------


def test_heavy_hitters_exact_vs_bruteforce(spark):
    from collections import Counter

    from vectordb_etl_spark.functions.sketches import heavy_hitters

    # zipf-ish synthetic stream: value v appears ~ N/v times
    rows = [(f"v{v:03d}",) for v in range(1, 60) for _ in range(600 // v)]
    df = spark.createDataFrame(rows, ["x"]).repartition(8)
    for k in (5, 20, 50):
        got = {
            (r["item"], r["cnt"])
            for r in heavy_hitters(df, "x", k).collect()
        }
        c = Counter(x for x, in rows)
        n = len(rows)
        want = {(v, cnt) for v, cnt in c.items() if cnt * k > n}
        assert got == want, k


def test_heavy_hitters_partials_bounded_and_superset(spark):
    from collections import Counter

    from vectordb_etl_spark.functions.sketches import misra_gries_partials

    rows = [(f"v{v:02d}",) for v in range(1, 40) for _ in range(400 // v)]
    df = spark.createDataFrame(rows, ["x"]).repartition(4)
    k = 10
    parts = misra_gries_partials(df, "x", k).collect()
    # bound: <= k rows per partition -> <= 4k total
    assert len(parts) <= 4 * k
    cands = {r["item"] for r in parts}
    c = Counter(x for x, in rows)
    n = len(rows)
    heavy = {v for v, cnt in c.items() if cnt * k > n}
    assert heavy <= cands  # the completeness guarantee


def test_heavy_hitters_null_keys_excluded(spark):
    import duckdb

    from vectordb_etl_spark.functions.sketches import (
        heavy_hitters,
        heavy_hitters_sql,
    )

    rows = [(None,)] * 50 + [("a",)] * 30 + [("b",)] * 2
    df = spark.createDataFrame(rows, "x string")
    got = sorted(map(tuple, heavy_hitters(df, "x", 4).collect()))
    con = duckdb.connect()
    con.register("t", df.toPandas())
    want = sorted(
        map(
            tuple,
            con.execute(
                heavy_hitters_sql("SELECT * FROM t", "x", 4)
            ).fetchall(),
        )
    )
    assert got == want
    # NULLs are not items on either engine; 'a' qualifies vs the
    # non-null total (30*4 > 32)
    assert [i for i, _ in got] == ["a"]


def test_bitmap_distinct_equals_count_distinct(spark):
    from pyspark.sql import functions as F

    from vectordb_etl_spark.functions.sketches import bitmap_distinct

    rows = [(g, v % 97) for g in ("a", "b") for v in range(500)] + [
        ("a", None),
        ("b", 10_000_000),  # far word — sparse domain still exact
    ]
    df = spark.createDataFrame(rows, "g string, v bigint")
    got = {
        r["g"]: r["n_distinct"]
        for r in bitmap_distinct(df, "v", ["g"]).collect()
    }
    want = {
        r["g"]: r["n"]
        for r in df.groupBy("g")
        .agg(F.count_distinct("v").alias("n"))
        .collect()
    }
    assert got == want == {"a": 97, "b": 98}


def test_bitmap_merge_is_union_and_idempotent(spark):
    from vectordb_etl_spark.functions.sketches import (
        bitmap_merge,
        bitmap_registers,
    )

    a = spark.createDataFrame([(v,) for v in range(0, 150)], "v bigint")
    b = spark.createDataFrame([(v,) for v in range(100, 250)], "v bigint")
    ra, rb = bitmap_registers(a, "v"), bitmap_registers(b, "v")
    merged = bitmap_merge(ra.unionByName(rb))
    whole = bitmap_registers(a.unionByName(b).distinct(), "v")
    assert sorted(map(tuple, merged.collect())) == sorted(
        map(tuple, whole.collect())
    )
    again = bitmap_merge(merged.unionByName(ra))
    assert sorted(map(tuple, again.collect())) == sorted(
        map(tuple, whole.collect())
    )


def test_bitmap_rejects_negative_values(spark):
    import pytest as _pt
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from vectordb_etl_spark.functions.sketches import bitmap_distinct

    df = spark.createDataFrame([(1,), (-5,)], "v bigint")
    with _pt.raises(SparkRuntimeException, match="negative value"):
        bitmap_distinct(df, "v").collect()


def test_kmv_difference_exact_under_k(spark):
    from vectordb_etl_spark.functions.sketches import (
        kmv_difference,
        kmv_registers,
    )

    # |A ∪ B| = 150 < k=256: estimator bypassed, difference is EXACT
    a_vals = spark.createDataFrame([(v,) for v in range(100)], ["v"])
    b_vals = spark.createDataFrame([(v,) for v in range(50, 150)], ["v"])
    a = kmv_registers(a_vals, "v", k=256)
    b = kmv_registers(b_vals, "v", k=256)
    row = kmv_difference(a, b, k=256).first()
    assert row["n_union_regs"] == 150
    assert row["n_only_a"] == 50
    assert row["diff_est"] == 50


def test_kmv_difference_estimates_at_scale(spark):
    from vectordb_etl_spark.functions.sketches import (
        kmv_difference,
        kmv_registers,
    )

    # 5000 union values, 1000 only in A: estimate within 35% at k=256
    a_vals = spark.createDataFrame([(v,) for v in range(5000)], ["v"])
    b_vals = spark.createDataFrame([(v,) for v in range(1000, 5000)], ["v"])
    a = kmv_registers(a_vals, "v", k=256).localCheckpoint(eager=True)
    b = kmv_registers(b_vals, "v", k=256).localCheckpoint(eager=True)
    row = kmv_difference(a, b, k=256).first()
    assert 650 <= row["diff_est"] <= 1350


def test_hll_saturated_register_matches_duckdb_and_canonical(spark):
    """The rho = W+1 saturated rank (all rank bits zero; the case the old
    greatest(...,0) clamp distorted — ADVICE r07): hand-built register
    tables containing the saturated rank must (a) produce the same
    estimate on both engines and (b) differ from a rho=W table — the
    canonical 2^-rho sum distinguishes them where the clamp mapped both
    to the same contribution."""
    from vectordb_etl_spark.functions.sketches import (
        _HASH_BITS,
        hll_estimate_expr,
        hll_estimate_sql_exprs,
    )

    p = 8
    w = _HASH_BITS - p
    con = duckdb.connect()
    ests = {}
    for rho in (w, w + 1):
        # every bucket at the extreme rank: the 2x harmonic-sum gap
        # survives floor() (a single saturated register among normal
        # ones is a ~2^-52 relative change, invisible after floor)
        rows = [(b, rho) for b in range(256)]
        sdf = spark.createDataFrame(rows, "__hll_bucket int, max_rho int")
        got = sdf.agg(hll_estimate_expr(p).alias("hll_est")).head()
        vals = ", ".join(f"({b}, {r})" for b, r in rows)
        want = con.execute(
            f"SELECT {hll_estimate_sql_exprs(p)} FROM "
            f"(VALUES {vals}) AS t(__hll_bucket, max_rho)"
        ).fetchone()
        assert got["hll_est"] == want[1], rho
        ests[rho] = got["hll_est"]
    # a saturated register contributes 2^-(W+1) < 2^-W: strictly larger
    # estimate than the rho=W table (the clamp made these equal)
    assert ests[w + 1] > ests[w], ests
