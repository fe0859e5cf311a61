"""SparkSession factory with scale-aware defaults.

Local testing runs on local[N]; the same settings are what we'd ship on a
1000-executor cluster: AQE on (runtime re-plan, skew-join handling), small
broadcast threshold respected, Arrow enabled for the pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "vectordb-etl-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        # tz-less parquet TIMESTAMP reads as an instant (naive = UTC), not
        # TIMESTAMP_NTZ — epoch arithmetic (unix_micros) needs instants, and
        # this matches DuckDB's naive-as-UTC epoch_us semantics
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def local_rows_df(spark, rows, schema, slices: int = 1):
    """Small local-rows DataFrame with a BOUNDED slice count.

    ``spark.createDataFrame(rows)`` parallelizes the local collection
    over ``defaultParallelism`` pickled slices — on local[32] that is 32
    near-empty tasks (each a Python-worker round trip) for a handful of
    rows, measured ~0.3 s of pure scheduling per materialization. The
    data and schema are identical through ``sc.parallelize(rows, n)``;
    only the slice count changes (guide §2.2: fewer, larger tasks).
    Callers pass the query vectors / probe pairs / sketch meta rows that
    are small BY CONTRACT at any scale — real tables never come through
    here."""
    rows = list(rows)
    n = max(1, min(slices, len(rows)))
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, n), schema
    )


def ensure_min_partitions(df, min_partitions: int | None = None):
    """Round-robin repartition iff the input is under-partitioned.

    Small-file inputs (one parquet file = one partition) would otherwise run
    every downstream pandas-UDF stage on a single core. At 100 TB the scan
    has thousands of splits and this is a no-op; locally it turns a 1-core
    chunk/embed stage into an N-core one. The guard avoids paying a shuffle
    when the source is already parallel."""
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(2, target // 2):
        return df.repartition(target)
    return df
