"""Warehouse health dashboard — the TABLE-side companion to
examples/corpus_observability.py (which watches the document corpus):
the per-table reports a lakehouse runs on every snapshot before
promoting it, composed from the package's profiling/CDC operators:

    column profile   one-pass ANALYZE stats (operators/profile)
    value histogram  equi-depth buckets of the hot measure
    correlation      pinned Pearson ppm between two measures
    trend            per-group OLS slope of daily volumes
    snapshot diff    added/removed/changed classification (table_diff)
    file skipping    per-file Bloom manifest point-lookup pruning

Every number is integer / pinned arithmetic — two runs (or two engines)
produce byte-identical JSON. Run:

    python examples/warehouse_health.py [sf_dir]

default: /root/testdata/sf0.001. Prints one JSON line per section.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def warehouse_health(spark, orders, lineitem, events) -> dict:
    """All sections as plain dicts (collected — report-sized results)."""
    from vectordb_etl_spark.operators.profile import (
        equi_depth_histogram,
        ols_slope_ppm,
        pearson_corr_ppm,
        profile_table,
    )
    from vectordb_etl_spark.store.layout import (
        bloom_prune_files,
        file_bloom_manifest,
    )
    from vectordb_etl_spark.store.snapshots import table_diff

    out: dict = {}

    # 1. one-pass per-column ANALYZE profile of orders
    out["column_profile"] = {
        r["column"]: {
            "n_rows": r["n_rows"],
            "n_nulls": r["n_nulls"],
            "n_distinct": r["n_distinct"],
            "min": r["min_repr"],
            "max": r["max_repr"],
        }
        for r in profile_table(orders).collect()
    }

    # 2. equi-depth histogram of the hot measure
    out["price_histogram"] = [
        {"bucket": r["bucket"], "n": r["n"],
         "lo_micro": r["lo_micro"], "hi_micro": r["hi_micro"]}
        for r in equi_depth_histogram(
            lineitem, "l_extendedprice", buckets=8
        ).collect()
    ]

    # 3. pinned correlation between price and quantity
    c = pearson_corr_ppm(
        lineitem, "l_extendedprice", "l_quantity", x_scale=100
    ).first()
    out["price_quantity_corr"] = {"n": c["n"], "corr_ppm": c["corr_ppm"]}

    # 4. per-type daily volume trend
    daily = (
        events.groupBy("event_type", F.date_trunc("day", "ts").alias("day"))
        .agg(F.count("*").alias("y"))
        .select(
            "event_type",
            F.datediff("day", F.lit("1970-01-01")).alias("x"),
            "y",
        )
    )
    out["daily_trend"] = {
        r["event_type"]: r["slope_ppm"]
        for r in ols_slope_ppm(daily, "x", "y", ["event_type"]).collect()
    }

    # 5. CDC classification of a deterministic mutation
    od = orders.select("o_orderkey", "o_orderstatus")
    k = F.col("o_orderkey")
    mutated = od.filter(k % 19 != 3).withColumn(
        "o_orderstatus",
        F.when(k % 19 == 5, F.lit("X")).otherwise(F.col("o_orderstatus")),
    )
    out["snapshot_diff"] = {
        r["change_type"]: r["n"]
        for r in table_diff(od, mutated, ["o_orderkey"])
        .groupBy("change_type")
        .agg(F.count("*").cast("bigint").alias("n"))
        .collect()
    }

    # 6. per-file Bloom manifest point-lookup pruning
    with tempfile.TemporaryDirectory() as tmp:
        p = f"{tmp}/orders"
        orders.select("o_orderkey").repartitionByRange(
            8, "o_orderkey"
        ).write.parquet(p)
        man = file_bloom_manifest(spark, p, "o_orderkey", m_bits=65536, k=3)
        probe = int(orders.agg(F.min("o_orderkey")).first()[0])
        out["bloom_file_skipping"] = {
            "n_files": man.select("file").distinct().count(),
            "candidates_for_min_key": bloom_prune_files(
                man, [probe], m_bits=65536, k=3
            ).count(),
        }
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    from vectordb_etl_spark.session import get_spark

    spark = get_spark("warehouse_health", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    events = _read_events(spark, sf_dir)
    report = warehouse_health(spark, orders, lineitem, events)
    for section, payload in report.items():
        print(json.dumps({section: payload}, sort_keys=True))


def _read_events(spark, sf_dir: str):
    # events.parquet can carry TIMESTAMP(NANOS): read nanos as long and
    # truncate to micros, the same rule as the entry file's _events
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    if dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


if __name__ == "__main__":
    main()
