"""Curation tier: PII redaction, deterministic sampling, contamination."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.functions import curation
from vectordb_etl_spark.operators import dedup as D


def test_redact_pii_strips_known_shapes(spark):
    text = (
        "mail a.b+c@test.co.kr phone 010-1234-5678 intl +82-10-9999-0000 "
        "ip 192.168.0.1 card 1234-5678-9012-3456 rrn 900101-1234567 done"
    )
    row = spark.createDataFrame([(text,)], ["t"]).select(
        curation.redact_pii_col("t").alias("r"),
        curation.pii_hit_counts_col("t").alias("n"),
    ).first()
    r = row["r"]
    assert "<EMAIL>" in r and "<PHONE>" in r and "<IP>" in r
    assert "<CARD>" in r and "<RRN>" in r
    for leaked in ("test.co.kr", "1234-5678", "192.168", "900101"):
        assert leaked not in r
    assert row["n"] == 6


def test_redact_pii_leaves_clean_text_alone(spark):
    text = "version 1.2.3 released on 2024-01-01 at cost 1,000 won"
    row = spark.createDataFrame([(text,)], ["t"]).select(
        curation.redact_pii_col("t").alias("r")
    ).first()
    assert row["r"] == text


def test_deterministic_sample_is_stable_and_calibrated(spark):
    df = spark.range(0, 20000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in curation.deterministic_sample(df, "doc_id", 0.3).collect()}
    b = {r["doc_id"] for r in curation.deterministic_sample(df, "doc_id", 0.3).collect()}
    assert a == b  # same rows every run — md5 threshold, not rand()
    assert abs(len(a) / 20000 - 0.3) < 0.02
    # nested property: a smaller fraction is a subset of a larger one
    c = {r["doc_id"] for r in curation.deterministic_sample(df, "doc_id", 0.1).collect()}
    assert c <= a


def test_stratified_sample_rates(spark):
    df = spark.createDataFrame(
        [(i, "hot" if i % 2 else "rare") for i in range(20000)],
        ["doc_id", "domain"],
    )
    out = curation.stratified_sample(
        df, "doc_id", "domain", {"hot": 0.1, "rare": 1.0}
    )
    rates = {
        r["domain"]: r["n"] / 10000
        for r in out.groupBy("domain").agg(F.count("*").alias("n")).collect()
    }
    assert rates["rare"] == 1.0
    assert abs(rates["hot"] - 0.1) < 0.02


def test_contamination_finds_planted_copy_and_broadcasts(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog in the park today"),
            (2, "completely unrelated text about spark physical plans and shuffles"),
            (3, "benchmark question the quick brown fox jumps over the lazy dog"),
        ],
        ["doc_id", "text"],
    )
    probes = spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")],
        ["probe_id", "text"],
    )
    out = D.shingle_contamination(corpus, probes, min_overlap=5)
    hits = {(r["doc_id"], r["probe_id"]) for r in out.collect()}
    assert (1, 100) in hits and (3, 100) in hits and (2, 100) not in hits
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # probe side broadcast, corpus streams


def test_mix_fractions_budget_math(spark):
    from vectordb_etl_spark.functions.curation import mix_fractions

    rows = [
        (i, "big", 100) for i in range(100)      # 10,000 tokens available
    ] + [
        (i + 100, "small", 100) for i in range(10)  # 1,000 tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, domain string, tok long")
    fr = mix_fractions(
        df, "domain", "tok", {"big": 0.5, "small": 0.5}, total_tokens=2000
    )
    # big: wants 1000 of 10000 → 0.1; small: wants 1000 of 1000 → capped 1.0
    assert fr["big"] == pytest.approx(0.1)
    assert fr["small"] == 1.0
    # absent stratum in targets is simply not emitted
    fr2 = mix_fractions(
        df, "domain", "tok", {"big": 1.0, "missing": 0.5}, total_tokens=500
    )
    assert set(fr2) == {"big"}


def test_weighted_sample_favors_heavy_weights_and_excludes_zero(spark):
    from vectordb_etl_spark.functions.curation import weighted_sample

    # 500 light (w=1) vs 500 heavy (w=50) items: E-S first-pick probability
    # is w/Σw, so a top-100 draw should be dominated by heavy items
    rows = [(i, 1) for i in range(500)] + [(i + 500, 50) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    got = weighted_sample(df, k=100, id_col="doc_id", weight_col="w").collect()
    assert len(got) == 100
    heavy = sum(1 for r in got if r["doc_id"] >= 500)
    assert heavy >= 85  # expectation ≈ 98; md5 draw is fixed, not flaky
    # deterministic: same input → identical selection
    again = weighted_sample(df, k=100, id_col="doc_id", weight_col="w").collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)

    # zero/negative weights can never be selected
    dfz = spark.createDataFrame(
        [(1, 0), (2, -5), (3, 10)], "doc_id long, w long"
    )
    gotz = weighted_sample(dfz, k=3, id_col="doc_id", weight_col="w").collect()
    assert [r["doc_id"] for r in gotz] == [3]

    # global top-k plans as TakeOrderedAndProject, never a global sort
    plan = (
        weighted_sample(df, k=10, id_col="doc_id", weight_col="w")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan


def test_weighted_sample_stratified_per_group_k(spark):
    from vectordb_etl_spark.functions.curation import weighted_sample

    rows = [(i, "a" if i % 2 else "b", 1 + i % 7) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, s string, w long")
    got = weighted_sample(
        df, k=5, id_col="doc_id", weight_col="w", strata_col="s"
    ).collect()
    per = {}
    for r in got:
        per.setdefault(r["s"], []).append(r["doc_id"])
    assert sorted(per) == ["a", "b"] and all(len(v) == 5 for v in per.values())


def test_percentile_screen_bounds_inclusive(spark):
    from vectordb_etl_spark.functions.curation import percentile_screen

    # 1..100: p10/p90 interpolate to 10.9 and 90.1 — keep 11..90
    df = spark.createDataFrame([(i, i) for i in range(1, 101)], "doc_id long, n long")
    kept = sorted(
        r["doc_id"]
        for r in percentile_screen(df, "n", lo_p=0.10, hi_p=0.90).collect()
    )
    assert kept == list(range(11, 91))
    # no driver collect: thresholds join in as a broadcast 1-row aggregate
    plan = (
        percentile_screen(df, "n", 0.1, 0.9)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_dsir_log_weights_match_reference_formula(spark):
    """Recompute the DSIR weight in pure Python with the same md5 bucketing
    and add-alpha smoothing; target-leaning docs must score higher."""
    import hashlib
    import math
    from collections import Counter

    B, A = 16, 1.0

    def bucket(tok: str) -> int:
        return int(hashlib.md5(tok.encode()).hexdigest()[:6], 16) % B

    raw = [(1, "ml training data corpus"), (2, "cooking recipes and food"),
           (3, "ml models and data")]
    tgt = ["ml data models training", "ml corpus"]
    df = spark.createDataFrame(raw, ["doc_id", "text"])
    tdf = spark.createDataFrame([(t,) for t in tgt], ["text"])

    ct = Counter(bucket(t) for s in tgt for t in s.split())
    cr = Counter(bucket(t) for _, s in raw for t in s.split())
    tt, tr = sum(ct.values()), sum(cr.values())

    def expected(text: str) -> float:
        w = 0.0
        for tok in text.lower().split():
            b = bucket(tok)
            w += math.log((ct.get(b, 0) + A) / (tt + A * B))
            w -= math.log((cr[b] + A) / (tr + A * B))
        return round(w, 6)

    out = {
        r["doc_id"]: r
        for r in curation.dsir_log_weights(df, tdf, buckets=B, alpha=A).collect()
    }
    for doc_id, text in raw:
        assert out[doc_id]["n_tokens"] == len(text.split())
        assert abs(out[doc_id]["log_weight"] - expected(text)) < 1e-9
    # the ML-ish docs outrank the cooking doc toward the ML target
    assert out[1]["log_weight"] > out[2]["log_weight"]
    assert out[3]["log_weight"] > out[2]["log_weight"]


def test_dsir_zero_token_doc_null_weight(spark):
    df = spark.createDataFrame([(1, "   "), (2, "a b")], ["doc_id", "text"])
    tdf = spark.createDataFrame([("a",)], ["text"])
    out = {r["doc_id"]: r for r in curation.dsir_log_weights(df, tdf).collect()}
    assert out[1]["n_tokens"] == 0 and out[1]["log_weight"] is None
    assert out[2]["n_tokens"] == 2


def test_hashed_classifier_scores_mean_and_nulls(spark):
    """Scoring is the exact floored mean of bucket weights; token-less docs
    get NULL; negative sums floor toward -inf (cross-engine rule)."""
    from vectordb_etl_spark.functions.curation import (
        _token_bucket_col,
        classifier_weight_table,
        hashed_classifier_scores,
    )

    w = classifier_weight_table(spark, buckets=16, seed=7)
    wmap = {r["bk"]: r["w_micro"] for r in w.collect()}
    assert len(wmap) == 16
    assert any(v < 0 for v in wmap.values())  # negatives exercised

    df = spark.createDataFrame(
        [(1, "alpha beta GAMMA"), (2, "   "), (3, "alpha")],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in hashed_classifier_scores(
        df, w, buckets=16).collect()}

    def bucket(tok):
        import hashlib
        return int(hashlib.md5(tok.encode()).hexdigest()[:6], 16) % 16

    toks = ["alpha", "beta", "gamma"]
    s = sum(wmap[bucket(t)] for t in toks)
    assert out[1]["n_tokens"] == 3
    # python // floors — exactly the pmod identity the operator states
    assert out[1]["score_micro"] == s // 3
    assert out[2]["n_tokens"] == 0 and out[2]["score_micro"] is None
    assert out[3]["score_micro"] == wmap[bucket("alpha")]


def test_sample_quantiles_deterministic_and_matches_duckdb(spark):
    """Sample quantiles: engine parity bit-for-bit (including the
    interpolated doubles), sane ordering across probs, and closeness to
    the exact full-data quantiles at a healthy sampling fraction."""
    import duckdb

    from tests.conftest import SF_SMALL
    from vectordb_etl_spark.functions.curation import (
        sample_quantiles,
        sample_quantiles_sql,
    )

    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet").select(
        "l_orderkey", "l_extendedprice"
    )
    probs = [0.1, 0.5, 0.9]
    got = sorted(
        map(
            tuple,
            sample_quantiles(
                li, "l_orderkey", "l_extendedprice", probs, fraction=0.2
            ).collect(),
        )
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM '{SF_SMALL}/lineitem.parquet'"
    )
    want = sorted(
        con.execute(
            sample_quantiles_sql(
                "SELECT l_orderkey, l_extendedprice FROM lineitem",
                "l_orderkey",
                "l_extendedprice",
                probs,
                fraction=0.2,
            )
        ).fetchall()
    )
    assert got == want
    qs = {p: q for p, q in got}
    assert qs[100000] < qs[500000] < qs[900000]
    exact = {
        int(p * 1e6): li.agg(
            F.expr(f"percentile(l_extendedprice, {p})")
        ).collect()[0][0]
        for p in probs
    }
    for p_ppm, q in got:
        spread = exact[900000] - exact[100000]
        assert abs(q - exact[p_ppm]) < 0.15 * spread, (p_ppm, q, exact[p_ppm])


def test_leakage_safe_split_groups_never_straddle(spark):
    # duplicated texts share a group key; every group must land in ONE split
    rows = [(i, f"doc body {i % 40}") for i in range(400)]
    df = spark.createDataFrame(rows, ["doc_id", "text"]).select(
        "doc_id", F.md5("text").alias("g")
    )
    out = curation.leakage_safe_split(
        df, "g", [("train", 0.8), ("val", 0.1), ("test", 0.1)]
    )
    spans = (
        out.groupBy("g")
        .agg(F.countDistinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
    )
    assert spans == 0
    # all three splits materialize and fractions are grossly sane on the
    # GROUP level (40 groups, md5-uniform)
    per = dict(
        (r["split"], r["n"])
        for r in out.select("g", "split")
        .distinct()
        .groupBy("split")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    assert set(per) == {"train", "val", "test"}
    assert per["train"] > per["val"] and per["train"] > per["test"]


def test_leakage_safe_split_rejects_bad_fractions(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "g"])
    with pytest.raises(ValueError):
        curation.leakage_safe_split(df, "g", [("train", 0.5), ("val", 0.4)])
