"""Physical-plan assertions: the scale properties the engine promises —
predicate pushdown, partition pruning, broadcast joins, codegen-only scalar
paths, top-k without global sort — verified on `.explain` output so a
regression in plan shape fails CI, not just a benchmark."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.config import EmbeddingConfig, StoreConfig
from vectordb_etl_spark.functions import cleaning, language
from vectordb_etl_spark.operators.topk import topk_search
from vectordb_etl_spark.store.collections import CollectionStore

SF = "/root/testdata/sf0.001"


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def store(spark, tmp_path_factory):
    work = tmp_path_factory.mktemp("planwh")
    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(work)))
    docs = spark.read.parquet(f"{SF}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("chunk_id"),
        "text",
        F.col("lang").alias("language"),
        F.when(F.col("doc_id") % 2 == 0, "even").otherwise("odd").alias("folder_name"),
        F.col("source"),
        F.lit("f.html").alias("filename"),
    )
    store.insert_documents(docs, embedding_config=EmbeddingConfig(dimension=16))
    return store


def test_language_filter_pushed_to_parquet_scan(store):
    df = store.read().filter(F.col("language") == "korean").select("chunk_id")
    plan = plan_of(df)
    assert "PushedFilters: [IsNotNull(language), EqualTo(language,korean)]" in plan
    # column pruning: scan must not read the wide text/embedding columns
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "text" not in read_schema and "embedding" not in read_schema


def test_collection_scan_prunes_partitions(store):
    df = store.read("html_even").select("chunk_id")
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    frag = plan.split("PartitionFilters")[1][:200]
    assert "collection" in frag
    # only the named collection's directory is scanned
    assert store.read("html_even").count() > 0


def test_scalar_pipeline_stays_in_codegen(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        cleaning.clean_text_col("text").alias("c"),
        language.detect_language_content_col("text").alias("lang"),
    )
    plan = plan_of(df)
    # JVM-side throughout: no Python evaluation nodes in the pure-expression
    # path. (Higher-order fns like transform/array_join legitimately opt out
    # of whole-stage codegen but still run as JVM expressions.)
    assert "EvalPython" not in plan
    assert "regexp_replace" in plan  # the chain really is plan expressions


def test_olap_agg_hash_aggregates_and_prunes_columns(spark):
    import __spark_entry__ as e

    plan = plan_of(e.queries()["pricing_summary"](spark, SF))
    assert "HashAggregate" in plan  # partial+final, not sort-based
    # column pruning: 5 of 10 lineitem columns read, shipdate not among them
    read_schema = plan.split("ReadSchema:")[1].split("\n")[0]
    assert "l_shipdate" not in read_schema and "l_orderkey" not in read_schema


def test_topk_plans_as_take_ordered(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = list(emb.head()["embedding"])
    df = topk_search(emb, q, k=5, tie_break=["vec_id"])
    assert "TakeOrderedAndProject" in plan_of(df)


def test_fanout_search_indexed_plan_prunes_and_takes_ordered(store, spark):
    """The facade's index_kind='ivf' path (VERDICT r08 item 6) must keep
    the IVF tier's plan economics: the probe reaches the parquet scan as a
    centroid_id PARTITION filter (only ~nprobe/nlist of the index read),
    and the global cross-collection merge is a TakeOrderedAndProject, not
    a global sort."""
    store.build_index("html_even", kind="ivf", nlist=4, max_iter=3)
    q = list(store.read().select("embedding").head()[0])
    df = store.fanout_search_indexed(
        q, k=3, nprobe=2, collections=["html_even"], tie_break=["chunk_id"],
        output_cols=["chunk_id", "language"],
    )
    plan = plan_of(df)
    assert "PartitionFilters" in plan
    frag = plan.split("PartitionFilters")[1][:300]
    assert "centroid_id" in frag
    assert "TakeOrderedAndProject" in plan


def test_star_join_broadcasts_dimensions(spark):
    import __spark_entry__ as e

    df = e.queries()["top_customers"](spark, SF)
    plan = plan_of(df)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan  # small dims must not sort-merge


def test_dedup_single_shuffle(spark):
    from vectordb_etl_spark.operators.chunker import remove_duplicate_chunks

    df = spark.read.parquet(f"{SF}/documents.parquet")
    out = remove_duplicate_chunks(df, order_cols=["doc_id"])
    plan = plan_of(out)
    # one hash-partition exchange (the dedup window), nothing else
    assert plan.count("Exchange hashpartitioning") == 1


def test_quality_report_single_aggregate_no_shuffle_explosion(spark):
    import __spark_entry__ as e

    df = e.queries()["quality_report"](spark, SF)
    plan = plan_of(df)
    # scalar report: partial+final agg — at most one single-partition exchange
    assert plan.count("Exchange") <= 2


def test_inspect_helpers_roundtrip(spark, store):
    from vectordb_etl_spark.plans import (
        count_exchanges,
        has_broadcast_join,
        has_partition_filter,
        pushed_filters,
        read_schema,
        uses_python_eval,
    )

    df = store.read().filter(F.col("language") == "korean").select("chunk_id")
    assert "EqualTo(language,korean)" in pushed_filters(df)
    assert "chunk_id" in read_schema(df)
    assert not uses_python_eval(df)
    assert has_partition_filter(store.read("html_even"), "collection")

    import __spark_entry__ as e

    assert has_broadcast_join(e.queries()["top_customers"](spark, SF))
    # orders pre-agg (1) + the as-of union-window (1); the operator alone is
    # single-shuffle (asserted in test_temporal)
    assert count_exchanges(e.queries()["asof_join_events_orders"](spark, SF)) == 2

    # the sanctioned Python hop IS visible where it belongs
    from vectordb_etl_spark.operators.chunker import chunk_documents

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    assert uses_python_eval(chunk_documents(docs))


def test_star_join_plan_shapes(spark):
    """Q3/Q12-shape queries: dim broadcast, fact filters at the scan, top-k
    without a global sort."""
    import __spark_entry__ as e

    from vectordb_etl_spark.plans import has_broadcast_join, pushed_filters

    df = e.queries()["shipping_priority"](spark, SF)
    plan = plan_of(df)
    assert has_broadcast_join(df)  # filtered customer dim is broadcast
    assert any("l_shipdate" in f for f in pushed_filters(df))
    assert "TakeOrderedAndProject" in plan  # limit 10 never globally sorts

    df = e.queries()["priority_shipments"](spark, SF)
    # the date band reaches the lineitem scan as two pushed range filters
    shipdate_filters = [f for f in pushed_filters(df) if "l_shipdate" in f]
    assert len(shipdate_filters) >= 2

    df = e.queries()["supplier_balance_by_region"](spark, SF)
    assert plan_of(df).count("BroadcastHashJoin") == 2  # nation + region


def test_vocab_top_terms_partial_agg_and_take_ordered(spark):
    # word-count shape at 100 TB: the explode must stay map-local (no
    # exchange before the partial aggregate), term counting must get
    # map-side partial aggregation, and the final top-20 must plan as
    # TakeOrderedAndProject, never a global sort
    import __spark_entry__ as e

    df = e.queries()["vocab_top_terms"](spark, SF)
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "Sort " not in plan  # no global sort for a limit-20
    # plan prints top-down: the agg shuffle, then the partial aggregate, then
    # the explode below it — i.e. explode output is combined map-side and the
    # shuffle carries (term, partial_count), never raw exploded rows
    assert (
        plan.index("hashpartitioning(term")
        < plan.index("partial_count")
        < plan.index("Generate explode")
    )


def test_embedding_topk_pairs_no_cartesian(spark):
    # the exact pair search must plan as block-replicate -> one shuffle on
    # the block-pair key -> local BLAS matmul (FlatMapGroupsInPandas) ->
    # TakeOrderedAndProject, never a nested-loop/cartesian materializing n²
    # pair rows through the JVM
    from vectordb_etl_spark.operators.dedup import embedding_topk_pairs
    from vectordb_etl_spark.plans.inspect import executed_plan

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = executed_plan(embedding_topk_pairs(emb, k=5))
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "FlatMapGroupsInPandas" in plan
    assert "TakeOrderedAndProject" in plan


def test_semi_anti_join_shapes(spark):
    # EXISTS/NOT EXISTS run as LeftSemi/LeftAnti hash joins (match
    # multiplicity never materialized), not as inner joins + dedup
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    semi_plan = qs["returned_orders"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    anti_plan = qs["customers_without_big_orders"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert "LeftSemi" in semi_plan
    assert "LeftAnti" in anti_plan


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # two tables bucketed on the same key/count: the join must reuse the
    # write-time partitioning — zero Exchange nodes in the physical plan
    from vectordb_etl_spark.store.layout import write_bucketed

    a = spark.range(0, 1000).selectExpr("id AS k", "id * 2 AS va")
    b = spark.range(0, 1000).selectExpr("id AS k", "id * 3 AS vb")
    write_bucketed(a, "bkt_a", str(tmp_path / "a"), "k", num_buckets=8, sort_col="k")
    write_bucketed(b, "bkt_b", str(tmp_path / "b"), "k", num_buckets=8, sort_col="k")
    # disable auto-broadcast: at real scale neither side broadcasts, and a
    # broadcast join would bypass (and hide) the bucketed layout under test
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "Bucketed: true" in plan
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_hybrid_rrf_bounded_pools_no_global_window(spark):
    # each retrieval branch must cut to a bounded pool via
    # TakeOrderedAndProject (per-partition heap, no global sort), and every
    # Window in the plan must carry a partition key (branch) — an
    # empty-partition Window would be a single-reducer sort of the whole
    # input, the 100 TB killer flagged in round 2
    import re

    import __spark_entry__ as entrymod

    df = entrymod.queries()["hybrid_rrf_search"](spark, SF)
    plan = plan_of(df)
    # two branch cuts (limit=200) + the final fused top-10
    assert plan.count("TakeOrderedAndProject") == 3
    # partition-local sorts (Window ordering) are fine; global sorts are not
    assert not re.search(r"Sort \[[^\]]*\], true", plan)
    for spec in re.findall(r"windowspecdefinition\(([^)]*)\)", plan):
        assert spec.startswith("branch"), f"unpartitioned window: {spec}"


def test_cube_single_pass_and_window_battery_single_sort(spark):
    # cube(): all 4 grouping combos via ONE Expand + one aggregation
    # (never one scan per grouping set); the 4-function window query must
    # collapse into a single Window node (one shuffle+sort)
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    cube_plan = qs["events_cube"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert cube_plan.count("Expand") >= 1
    assert "Union" not in cube_plan
    win_plan = qs["user_event_windows"](spark, SF)._jdf.queryExecution().executedPlan().toString()
    assert win_plan.count("Window") <= 2  # lag/sum/ntile/pct_rank share frames
    assert win_plan.count("Exchange") == 1


def test_pivot_single_aggregate_no_union(spark):
    # PIVOT with enumerated values must compile to ONE partial+final
    # aggregate of conditional counts — never a per-value scan or union
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["event_type_pivot"](spark, SF))
    assert "Union" not in plan
    assert plan.count("Exchange") <= 2  # agg shuffle (+AQE read), no extras


def test_gap_fill_no_cartesian_and_axis_from_bounds(spark):
    # the dense hour axis must come from exploding per-group min/max bounds
    # (a row per TYPE), never a cartesian with a generated range
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["events_gap_fill"](spark, SF))
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "Generate explode" in plan


def test_set_ops_plan_as_semi_anti(spark):
    # EXCEPT/INTERSECT over distinct key sets plan as left-anti/left-semi
    # hash joins — match multiplicity never materializes
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["purchasers_without_errors"](spark, SF))
    assert "LeftAnti" in plan
    assert "LeftSemi" in plan
    assert "CartesianProduct" not in plan


def test_q18_having_aggregates_before_joins(spark):
    # the HAVING aggregate must run BEFORE the orders/customer joins so only
    # qualifying orderkeys flow into them: in the plan tree the lineitem
    # aggregate appears strictly below (after) the join nodes
    import __spark_entry__ as entrymod

    plan = plan_of(entrymod.queries()["large_order_customers"](spark, SF))
    first_join = min(
        i for i in (plan.find("SortMergeJoin"), plan.find("BroadcastHashJoin"),
                    plan.find("ShuffledHashJoin")) if i >= 0
    )
    agg_positions = [
        i for i in range(len(plan)) if plan.startswith("HashAggregate", i)
    ]
    assert any(i > first_join for i in agg_positions), (
        "no aggregate below the joins — HAVING did not pre-reduce lineitem"
    )


def test_clustered_write_enables_zone_map_skipping(spark, tmp_path):
    # after a range-clustered write, files are near-disjoint in the cluster
    # key and every row group's min-max is tight — verified on the actual
    # parquet footers — so a pushed range predicate can skip whole groups
    import pyarrow.parquet as pq

    from vectordb_etl_spark.store.layout import write_clustered

    ev = spark.read.parquet(f"{SF}/events.parquet")
    p = str(tmp_path / "events_by_user")
    write_clustered(ev, p, ["user_id"], num_files=8)

    import glob

    spans = []
    for f in sorted(glob.glob(f"{p}/part-*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            col = next(
                md.row_group(rg).column(i)
                for i in range(md.num_columns)
                if md.row_group(rg).column(i).path_in_schema == "user_id"
            )
            spans.append((col.statistics.min, col.statistics.max))
    spans.sort()
    # row groups must be non-overlapping in the cluster key (boundary
    # values may be shared across adjacent groups)
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, f"overlapping zone maps: {(lo1, hi1)} vs {(lo2, hi2)}"
    # and the pushed range predicate appears on the scan
    scan = spark.read.parquet(p).filter(
        (F.col("user_id") >= 10) & (F.col("user_id") <= 20)
    )
    plan = plan_of(scan)
    assert "GreaterThanOrEqual(user_id,10)" in plan


# -- plan-fingerprint regression guard (VERDICT r03 item 7) ------------------
#
# Wall-clock regressions hide in host-load noise; plan-shape regressions
# don't. Every registered query's {exchange, broadcast_hash_join,
# python_eval} counts are recorded in tools/plan_fingerprints.json; a query
# whose plan GAINS an exchange or a python hop fails here even when the
# benchmark happens to run fast. Regenerate deliberately with
# `python tools/gen_plan_fingerprints.py` and review the diff.


def test_registered_query_fingerprints_no_regression(spark):
    import json
    from pathlib import Path

    import __spark_entry__ as entry
    from vectordb_etl_spark.plans.inspect import (
        fingerprint_regressions,
        plan_fingerprint,
    )

    baseline = json.loads(
        (Path(__file__).resolve().parent.parent / "tools" /
         "plan_fingerprints.json").read_text()
    )
    problems = []
    for name, fn in entry.queries().items():
        if name not in baseline:
            problems.append(
                f"{name}: not in baseline — run tools/gen_plan_fingerprints.py"
            )
            continue
        fp = plan_fingerprint(fn(spark, SF))
        msgs = fingerprint_regressions(fp, baseline[name])
        if msgs:
            problems.append(f"{name}: {'; '.join(msgs)}")
    assert not problems, "plan regressions:\n" + "\n".join(problems)


def test_fingerprint_guard_catches_intentional_regression(spark):
    from vectordb_etl_spark.plans.inspect import (
        fingerprint_regressions,
        plan_fingerprint,
    )

    df = (
        spark.read.parquet(f"{SF}/orders.parquet")
        .groupBy("o_orderpriority")
        .count()
    )
    base = plan_fingerprint(df)
    assert base["exchange"] >= 1 and base["python_eval"] == 0
    # deliberately add a shuffle: the guard must flag the exchange gain
    worse = plan_fingerprint(df.repartition(8))
    assert any(
        "exchange" in m for m in fingerprint_regressions(worse, base)
    )

    # no type hints: `from __future__ import annotations` stringifies them
    # and the local pandas import can't resolve inside pandas_udf inference
    ident = F.pandas_udf(lambda s: s, "long")

    # deliberately add a python hop: the guard must flag it
    hopped = plan_fingerprint(df.withColumn("c2", ident(F.col("count"))))
    assert any(
        "python_eval" in m for m in fingerprint_regressions(hopped, base)
    )
    # unchanged plan stays silent; broadcast_hash_join delta alone is NOT a
    # regression (join flipping to broadcast is an improvement)
    assert fingerprint_regressions(base, base) == []
    assert fingerprint_regressions(
        {**base, "broadcast_hash_join": base["broadcast_hash_join"] + 1}, base
    ) == []


def test_training_shards_pack_aligned_and_sorted(spark, tmp_path):
    # packs must be contiguous within a file, files sorted by (bucket,
    # pack), and no pack may span two files — the sequential-read contract
    # a trainer's data loader relies on
    import glob

    import pyarrow.parquet as pq

    from vectordb_etl_spark.operators.packing import pack_sequences
    from vectordb_etl_spark.store.layout import write_training_shards

    rows = [(i, 100 + (i % 7) * 50) for i in range(400)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    packed = pack_sequences(
        df, id_col="doc_id", token_col="n_tokens", budget=600, buckets=4
    )
    p = str(tmp_path / "shards")
    write_training_shards(packed, p, shards_per_bucket=2)

    # bucket is a directory key
    bucket_dirs = sorted(glob.glob(f"{p}/bucket=*"))
    assert len(bucket_dirs) == 4

    pack_locations: dict[tuple, set] = {}
    for d in bucket_dirs:
        for f in glob.glob(f"{d}/part-*.parquet"):
            pdf = pq.read_table(f).to_pandas()
            if pdf.empty:
                continue
            # sorted by pack within the file, packs contiguous
            packs = pdf["pack_id"].tolist()
            assert packs == sorted(packs)
            for pk in set(packs):
                pack_locations.setdefault((d, pk), set()).add(f)
    # no (bucket, pack) appears in more than one file
    assert all(len(files) == 1 for files in pack_locations.values())
    # every row survived the layout
    assert spark.read.parquet(p).count() == 400


def test_zordered_write_skips_on_both_dimensions(spark, tmp_path):
    """Z-order layout must give file-level zone-map selectivity on BOTH
    clustered columns, where single-column range clustering only skips on
    its sort key. Measured on the real parquet footers: count the files a
    narrow predicate on each dimension would have to read."""
    import glob

    import pyarrow.parquet as pq

    from vectordb_etl_spark.store.layout import write_clustered, write_zordered

    ev = spark.read.parquet(f"{SF}/events.parquet").select("user_id", "value")
    zp = str(tmp_path / "z")
    cp = str(tmp_path / "c")
    write_zordered(ev, zp, ["user_id", "value"], bits=8, num_files=16)
    write_clustered(ev, cp, ["user_id"], num_files=16)

    def files_hit(path, col, lo, hi):
        total, hit = 0, 0
        for f in sorted(glob.glob(f"{path}/part-*.parquet")):
            md = pq.ParquetFile(f).metadata
            fl, fh = None, None
            for rg in range(md.num_row_groups):
                c = next(
                    md.row_group(rg).column(i)
                    for i in range(md.num_columns)
                    if md.row_group(rg).column(i).path_in_schema == col
                )
                st = c.statistics
                fl = st.min if fl is None else min(fl, st.min)
                fh = st.max if fh is None else max(fh, st.max)
            total += 1
            if not (fh < lo or fl > hi):
                hit += 1
        return hit, total

    bounds = ev.agg(
        F.min("user_id"), F.max("user_id"), F.min("value"), F.max("value")
    ).head()
    ulo, uhi, vlo, vhi = bounds
    uspan, vspan = uhi - ulo, vhi - vlo
    # ~5%-wide probes in each dimension
    uprobe = (ulo + 0.4 * uspan, ulo + 0.45 * uspan)
    vprobe = (vlo + 0.4 * vspan, vlo + 0.45 * vspan)

    zu, zt = files_hit(zp, "user_id", *uprobe)
    zv, _ = files_hit(zp, "value", *vprobe)
    cu, ct = files_hit(cp, "user_id", *uprobe)
    cv, _ = files_hit(cp, "value", *vprobe)

    # single-column clustering: selective on user_id, blind on value
    assert cu < ct
    assert cv == ct  # every file intersects the value probe
    # z-order: selective on BOTH dimensions
    assert zu < zt and zv < zt
    assert zu + zv < zt * 2  # strictly better than reading everything twice


def test_suppliers_kept_waiting_decorrelates_both_exists(spark):
    """Q21's EXISTS and NOT EXISTS must both decorrelate — one LeftSemi
    and one LeftAnti in a single plan, no correlated re-execution, no
    cartesian."""
    import __spark_entry__ as entrymod

    plan = (
        entrymod.queries()["suppliers_kept_waiting"](spark, SF)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_customer_order_distribution_zero_bucket_present(spark):
    """Q13's reason to exist: customers with no (qualifying) orders form
    the c_count=0 bucket — only an OUTER join preserves them."""
    import __spark_entry__ as entrymod

    rows = {
        r["c_count"]: r["custdist"]
        for r in entrymod.queries()["customer_order_distribution"](spark, SF).collect()
    }
    assert 0 in rows and rows[0] > 0
