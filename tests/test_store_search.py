"""End-to-end store + search tests (S8–S10, Q1–Q4, A11)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.config import EmbeddingConfig, StoreConfig
from vectordb_etl_spark.embeddings import query_vector, with_embeddings
from vectordb_etl_spark.functions.language import detect_language_content_col
from vectordb_etl_spark.operators.topk import fanout_search, topk_search
from vectordb_etl_spark.search import create_rag_prompt, search_with_scores
from vectordb_etl_spark.store.collections import CollectionStore

EMB = EmbeddingConfig(dimension=32)


@pytest.fixture(scope="module")
def store(spark, docs_tiny, tmp_path_factory):
    root = tmp_path_factory.mktemp("warehouse")
    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(root)))
    docs = docs_tiny.select(
        "doc_id",
        "source",
        F.col("source").alias("folder_name"),
        F.concat(F.col("source"), F.lit(".html")).alias("filename"),
        "text",
        detect_language_content_col("text").alias("language"),
        F.col("doc_id").alias("chunk_index"),
    ).limit(40)
    store.insert_documents(docs, embedding_config=EMB, mode="overwrite")
    return store


def test_collections_ddl(store):
    cols = store.list_collections()
    assert len(cols) > 1  # one per folder (source)
    assert all(c.startswith("html_") for c in cols)
    assert store.collection_exists(cols[0])
    assert not store.collection_exists("nope")


def test_collection_stats(store):
    stats = store.collection_stats()
    assert sum(stats.values()) == 40


def test_collection_stats_served_from_manifest_zero_jobs(
    spark, docs_tiny, tmp_path, monkeypatch
):
    """A11 at 100 TB: counts come from the _stats manifest maintained by
    the sinks (the parquet twin of Milvus num_entities' segment metadata,
    milvus_store.py:387-406) — the manifest path launches ZERO Spark scan
    jobs and tracks insert deltas, upsert totals and drops exactly."""
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    docs = docs_tiny.select(
        "doc_id", "source", F.col("source").alias("folder_name"), "text",
        F.lit("english").alias("language"),
    ).limit(20)
    store.insert_documents(docs, embedding_config=EMB)
    expected = store.collection_stats(use_manifest=False)  # scan truth
    assert sum(expected.values()) == 20

    def _no_jobs(*a, **k):
        raise AssertionError("manifest path must not launch a scan")

    monkeypatch.setattr(CollectionStore, "read", _no_jobs)
    assert store.collection_stats() == expected
    one = next(iter(expected))
    assert store.collection_stats(one) == {one: expected[one]}
    assert store.collection_stats("nope") == {}
    monkeypatch.undo()

    # append delta folds in without a scan
    more = docs.limit(5)
    store.insert_documents(more, embedding_config=EMB)
    after = store.collection_stats(use_manifest=False)
    monkeypatch.setattr(CollectionStore, "read", _no_jobs)
    assert store.collection_stats() == after
    assert sum(after.values()) == 25
    monkeypatch.undo()

    # upsert overlays post-merge totals (5 rows re-keyed, no growth)
    store.upsert_documents(more, key_col="doc_id", embedding_config=EMB)
    merged = store.collection_stats(use_manifest=False)
    monkeypatch.setattr(CollectionStore, "read", _no_jobs)
    assert store.collection_stats() == merged
    monkeypatch.undo()

    # drop removes the key from the manifest
    store.drop_collection(one)
    monkeypatch.setattr(CollectionStore, "read", _no_jobs)
    stats = store.collection_stats()
    assert one not in stats
    monkeypatch.undo()
    assert stats == store.collection_stats(use_manifest=False)


def test_collection_stats_manifest_staleness_guards(
    spark, docs_tiny, tmp_path, monkeypatch
):
    """The manifest must refuse to serve when it can be wrong: the
    streaming fast path (count_rows=False) invalidates it, an
    out-of-band partition directory fails the set cross-check — both
    fall back to the scan, which self-heals the manifest."""
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    docs = docs_tiny.select(
        "doc_id", "source", F.lit("f1").alias("folder_name"), "text",
        F.lit("english").alias("language"),
    ).limit(10)
    store.insert_documents(docs, embedding_config=EMB)
    assert store._latest_stats_counts() == {"html_f1": 10}

    # streaming fast path: unknown delta -> manifest marked invalid
    store.insert_documents(
        docs.limit(3), embedding_config=EMB, count_rows=False
    )
    assert store._latest_stats_counts() is None
    assert store.collection_stats() == {"html_f1": 13}  # scan fallback
    assert store._latest_stats_counts() == {"html_f1": 13}  # self-healed

    def _no_jobs(*a, **k):
        raise AssertionError("manifest path must not launch a scan")

    monkeypatch.setattr(CollectionStore, "read", _no_jobs)
    assert store.collection_stats() == {"html_f1": 13}
    monkeypatch.undo()

    # out-of-band write: a partition dir the manifest has never seen
    docs.limit(2).withColumn("collection", F.lit("html_rogue")).write.mode(
        "append"
    ).partitionBy("collection").parquet(store._data_dir)
    stats = store.collection_stats()  # set mismatch -> scan + re-seed
    assert stats == {"html_f1": 13, "html_rogue": 2}
    monkeypatch.setattr(CollectionStore, "read", _no_jobs)
    assert store.collection_stats() == stats
    monkeypatch.undo()

    # retention: heavy mutation traffic never accumulates unbounded
    # manifest files (pruned to the keep window at each commit)
    from vectordb_etl_spark.store.collections import _STATS_KEEP_VERSIONS

    for _ in range(_STATS_KEEP_VERSIONS + 5):
        store._update_stats(lambda prev: dict(prev) if prev else {"x": 1})
    fs = store._fs(store._root)
    assert len(store._stats_versions(fs)) <= _STATS_KEEP_VERSIONS
    assert store._latest_stats_counts() is not None  # latest survives


def test_collection_stats_survives_corrupt_manifest(
    spark, docs_tiny, tmp_path
):
    """A half-visible or hand-damaged latest manifest (object-store
    'rename' is a non-atomic copy) must degrade to the scan — never
    raise — and the scan's self-heal must commit a NEW version past the
    bad file (commits are rename-if-absent, so the bad file itself can
    never be rewritten in place)."""
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    docs = docs_tiny.select(
        "doc_id", "source", F.lit("f1").alias("folder_name"), "text",
        F.lit("english").alias("language"),
    ).limit(10)
    store.insert_documents(docs, embedding_config=EMB)
    fs = store._fs(store._root)
    v0 = store._stats_versions(fs)[-1]
    with open(f"{store._root}/_stats/{v0}.json", "w") as f:
        f.write('{"version": 0, "valid": true, "collections": {trunc')
    assert store._latest_stats_counts() is None  # degrade, don't raise
    assert store.collection_stats() == {"html_f1": 10}  # scan fallback
    vs = store._stats_versions(fs)
    assert vs[-1] > v0  # self-heal superseded the corrupt version
    assert store._latest_stats_counts() == {"html_f1": 10}
    # a mutation on top of the healed manifest folds normally again
    store.insert_documents(docs.limit(2), embedding_config=EMB)
    assert store._latest_stats_counts() == {"html_f1": 12}


def test_stats_manifest_lost_race_rebases_delta(
    spark, docs_tiny, tmp_path, monkeypatch
):
    """The optimistic-commit claim in _update_stats: a writer that loses
    the rename race must re-apply its DELTA onto whatever won — not
    overwrite the winner and not drop its own rows. Simulated by landing
    a competing manifest at the same version number between the loser's
    log read and its commit."""
    from vectordb_etl_spark.store.snapshots import try_commit_manifest

    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    docs = docs_tiny.select(
        "doc_id", "source", F.lit("f1").alias("folder_name"), "text",
        F.lit("english").alias("language"),
    ).limit(10)
    store.insert_documents(docs, embedding_config=EMB)
    assert store._latest_stats_counts() == {"html_f1": 10}

    real = CollectionStore._try_commit_stats
    calls = {"n": 0}

    def racy(self, fs, version, manifest):
        calls["n"] += 1
        if calls["n"] == 1:  # a concurrent writer wins this version
            won = {"version": version, "valid": True,
                   "collections": {"html_f1": 15}}
            assert try_commit_manifest(
                fs, self._jpath, self._stats_dir, version, won
            )
        return real(self, fs, version, manifest)

    monkeypatch.setattr(CollectionStore, "_try_commit_stats", racy)
    store.insert_documents(docs.limit(3), embedding_config=EMB)  # delta +3
    monkeypatch.undo()
    assert calls["n"] == 2  # first commit lost, retry won
    # +3 rebased onto the winner's 15 — not onto the loser's stale 10
    assert store._latest_stats_counts() == {"html_f1": 18}


def test_partition_pruning_on_named_collection(store):
    name = store.list_collections()[0]
    plan = store.read(name)._jdf.queryExecution().executedPlan().toString()
    # collection predicate must become a partition filter, not a row filter
    assert "PartitionFilters: [isnotnull(collection" in plan


def test_topk_search_exact(store):
    df = store.read()
    q = query_vector("test query", EMB)
    hits = topk_search(df, q, k=5, tie_break=["doc_id"]).collect()
    assert len(hits) == 5
    scores = [h["score"] for h in hits]
    assert scores == sorted(scores, reverse=True)


def test_fanout_matches_union_of_collections(store):
    q = query_vector("another query", EMB)
    global_hits = fanout_search(store.read(), q, k=3, tie_break=["doc_id"]).collect()
    per_col = []
    for c in store.list_collections():
        per_col.extend(
            topk_search(store.read(c), q, k=3, tie_break=["doc_id"]).collect()
        )
    per_col.sort(key=lambda r: (-r["score"], r["doc_id"]))
    assert [r["doc_id"] for r in global_hits] == [r["doc_id"] for r in per_col[:3]]


def test_search_facade_language_filter(store):
    hits = search_with_scores(
        store, "Seoul office address", k=3, embedding_config=EMB
    )
    # P4 detects english; all hits must be english
    assert all(h.metadata["language"] == "english" for h in hits)
    assert len(hits) <= 3


def test_rag_prompt_shape(store):
    # synthetic corpus is ASCII → detected english; an english query gets hits
    msgs = create_rag_prompt(store, "Seoul office address", k=2, embedding_config=EMB)
    assert [m["role"] for m in msgs] == ["system", "user"]
    assert "문서 1:" in msgs[0]["content"]


def test_drop_and_reset(spark, tmp_path):
    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "w")))
    df = spark.createDataFrame(
        [(1, "a", "f1", "t", "english", 0)],
        ["doc_id", "source", "folder_name", "text", "language", "chunk_index"],
    )
    store.insert_documents(df, embedding_config=EMB)
    assert store.list_collections() == ["html_f1"]
    store.drop_collection("html_f1")
    assert store.list_collections() == []
    with pytest.raises(ValueError):
        store.reset(confirm=False)


def test_ddl_is_uri_scheme_agnostic(spark, tmp_path):
    # DDL goes through the Hadoop FileSystem resolved from the warehouse URI
    # (not pathlib/shutil), so an explicit file:// root — standing in for
    # s3a://hdfs:// — must behave identically to a bare local path
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=f"file://{tmp_path}/wh")
    )
    df = spark.createDataFrame(
        [(1, "a", "f1", "t", "english", 0), (2, "b", "f2", "u", "english", 0)],
        ["doc_id", "source", "folder_name", "text", "language", "chunk_index"],
    )
    store.insert_documents(df, embedding_config=EMB)
    assert store.list_collections() == ["html_f1", "html_f2"]
    assert store.collection_exists("html_f1")
    store.drop_collection("html_f1")
    assert store.list_collections() == ["html_f2"]
    assert store.reset(confirm=True) == 1
    assert store.list_collections() == []


def test_compact_collection_reduces_files_keeps_rows(spark, tmp_path):
    from vectordb_etl_spark.store.layout import compact_collection

    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "w")))
    df = spark.createDataFrame(
        [(i, "s", "f1", f"text {i}", "english", 0) for i in range(200)],
        ["doc_id", "source", "folder_name", "text", "language", "chunk_index"],
    ).repartition(16)  # force many small files
    store.insert_documents(df, embedding_config=EMB)
    before, after = compact_collection(store, "html_f1", target_partitions=2)
    assert before >= 16 and after == 2
    assert store.read("html_f1").count() == 200


def test_store_index_lifecycle_ivf_and_graph(spark, tmp_path):
    import pyspark.sql.functions as F

    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "w")))
    df = spark.createDataFrame(
        [(i, "s", "f1", f"text about topic {i} with words", "english", 0)
         for i in range(60)],
        ["doc_id", "source", "folder_name", "text", "language", "chunk_index"],
    )
    store.insert_documents(df, embedding_config=EMB)
    chunks = store.read("html_f1")
    q = chunks.filter(F.col("doc_id") == 0).select("embedding").head()[0]

    ivf = store.build_index("html_f1", kind="ivf", nlist=4, max_iter=3)
    hits = ivf.search(list(q), k=3, nprobe=4, tie_break=["doc_id"],
                      output_cols=["doc_id"]).collect()
    assert len(hits) == 3 and hits[0]["score"] == 1.0  # self-hit tops

    g = store.build_index("html_f1", kind="graph", id_col="doc_id",
                          num_shards=2, m=4, ef_construction=20)
    ghits = g.search(list(q), k=3, ef=10000, output_cols=["id"]).collect()
    assert len(ghits) == 3 and ghits[0]["score"] == 1.0

    # reopen from the persisted artifact, no rebuild
    again = store.open_index("html_f1", kind="ivf")
    hits2 = again.search(list(q), k=3, nprobe=4, tie_break=["doc_id"],
                         output_cols=["doc_id"]).collect()
    assert [h["doc_id"] for h in hits2] == [h["doc_id"] for h in hits]


def test_fanout_search_indexed_matches_exact_merge(spark, tmp_path):
    """Q2 through per-collection IVF indexes (VERDICT r06 item 6): union
    of per-index probes + global merge equals the exact fan-out at the
    probe-all edge; un-indexed collections raise instead of silently
    falling back to a scan."""
    import pyspark.sql.functions as F

    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "w")))
    rows = [
        (i, "s", f"f{i % 3}", f"document number {i} talks about {i % 7}",
         "english", 0)
        for i in range(90)
    ]
    df = spark.createDataFrame(
        rows,
        ["doc_id", "source", "folder_name", "text", "language", "chunk_index"],
    )
    store.insert_documents(df, embedding_config=EMB)
    q = list(
        store.read().filter(F.col("doc_id") == 0).select("embedding").head()[0]
    )
    with pytest.raises(ValueError, match="no ivf index"):
        store.fanout_search_indexed(q, k=3, nprobe=4)
    exact = topk_search(
        store.read(), q, k=3, tie_break=["doc_id"], output_cols=["doc_id"]
    ).collect()
    # MIXED index state (VERDICT r07 item 4): index two of the three
    # collections, serve the third by exact scan via on_missing='exact' —
    # at the probe-all edge the merged result equals the exact fan-out
    names = store.list_collections()
    for c in names[:2]:
        store.build_index(c, kind="ivf", nlist=4, max_iter=3)
    mixed = store.fanout_search_indexed(
        q, k=3, nprobe=4, on_missing="exact",
        tie_break=["doc_id"], output_cols=["doc_id"],
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in mixed] == [
        (r["doc_id"], r["score"]) for r in exact
    ]
    for c in names[2:]:
        store.build_index(c, kind="ivf", nlist=4, max_iter=3)
    got = store.fanout_search_indexed(
        q, k=3, nprobe=4, tie_break=["doc_id"], output_cols=["doc_id"]
    ).collect()
    assert [(r["doc_id"], r["score"]) for r in got] == [
        (r["doc_id"], r["score"]) for r in exact
    ]
    # graph kind: tie_break must be consumed at the merge (GraphANNIndex
    # has no tie_break parameter — forwarding it used to TypeError), and
    # the full-beam edge matches the same exact merge
    # graph mixed state first: two collections indexed, the third served
    # exact (fallback surfaces doc_id as the graph tier's `id` column)
    for c in names[:2]:
        store.build_index(c, kind="graph", id_col="doc_id",
                          num_shards=2, m=4, ef_construction=20)
    gmixed = store.fanout_search_indexed(
        q, k=3, kind="graph", ef=100_000, on_missing="exact",
        fallback_id_col="doc_id", tie_break=["id"], output_cols=["id"],
    ).collect()
    assert [(r["id"], r["score"]) for r in gmixed] == [
        (r["doc_id"], r["score"]) for r in exact
    ]
    for c in names[2:]:
        store.build_index(c, kind="graph", id_col="doc_id",
                          num_shards=2, m=4, ef_construction=20)
    ggot = store.fanout_search_indexed(
        q, k=3, kind="graph", ef=100_000, tie_break=["id"],
        output_cols=["id"],
    ).collect()
    assert [(r["id"], r["score"]) for r in ggot] == [
        (r["doc_id"], r["score"]) for r in exact
    ]


def test_search_facade_index_kind_both_tiers(spark, tmp_path):
    """VERDICT r08 item 6 — the facade's index_kind routes through the
    store's per-collection indexes (fanout_search_indexed,
    on_missing='exact'), closing the API-shape gap vs the reference whose
    search always goes through the index (milvus_store.py:254-299).
    At the probe-all / full-beam edge both index tiers must return the
    exact facade's hits even in MIXED index state (one collection
    un-indexed, served by brute-force fallback)."""
    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "w")))
    rows = [
        (i, f"c{i:03d}", "s", f"f{i % 3}",
         f"document number {i} talks about {i % 7}", "english", 0)
        for i in range(90)
    ]
    df = spark.createDataFrame(
        rows,
        ["doc_id", "chunk_id", "source", "folder_name", "text",
         "language", "chunk_index"],
    )
    store.insert_documents(df, embedding_config=EMB)
    q = "document number 5 talks about 5"
    exact = search_with_scores(store, q, k=3, embedding_config=EMB)
    assert len(exact) == 3
    exact_key = [(h.text, round(h.score, 6)) for h in exact]

    names = store.list_collections()
    # mixed state: two collections indexed, the third exact-fallback
    for c in names[:2]:
        store.build_index(c, kind="ivf", nlist=4, max_iter=3)
    ivf = search_with_scores(
        store, q, k=3, embedding_config=EMB, index_kind="ivf", nprobe=4
    )
    assert [(h.text, round(h.score, 6)) for h in ivf] == exact_key
    # metadata keeps user columns, drops the IVF partition key
    assert all("centroid_id" not in h.metadata for h in ivf)

    for c in names[:2]:
        store.build_index(c, kind="graph", m=4, ef_construction=64,
                          num_shards=1)
    graph = search_with_scores(
        store, q, k=3, embedding_config=EMB, index_kind="graph",
        ef=1_000_000,
    )
    assert [(h.text, round(h.score, 6)) for h in graph] == exact_key

    # the language predicate still applies on the indexed path
    ivf_f = search_with_scores(
        store, q, k=3, embedding_config=EMB, index_kind="ivf", nprobe=4,
        filter='language == "english"',
    )
    assert [(h.text, round(h.score, 6)) for h in ivf_f] == exact_key

    with pytest.raises(ValueError, match="index_kind"):
        search_with_scores(
            store, q, k=3, embedding_config=EMB, index_kind="flat"
        )

    # ADVICE r10: a typo'd filter_mode must fail fast at the facade even
    # on paths that would otherwise silently ignore it (no predicate,
    # non-graph index_kind)
    with pytest.raises(ValueError, match="filter_mode"):
        search_with_scores(
            store, q, k=3, embedding_config=EMB, filter_mode="during"
        )
    with pytest.raises(ValueError, match="filter_mode"):
        search_with_scores(
            store, q, k=3, embedding_config=EMB, index_kind="ivf",
            filter_mode="traverse",
        )

    # ACORN-style during-traversal filtering through the facade: at the
    # full-beam edge it equals the exact filtered facade result, and the
    # mode flag must not break the mixed-state exact fallback
    exact_f = search_with_scores(
        store, q, k=3, embedding_config=EMB,
        filter='language == "english"',
    )
    acorn_f = search_with_scores(
        store, q, k=3, embedding_config=EMB, index_kind="graph",
        ef=1_000_000, filter='language == "english"',
        filter_mode="traversal",
    )
    assert [(h.text, round(h.score, 6)) for h in acorn_f] == [
        (h.text, round(h.score, 6)) for h in exact_f
    ]


def test_sql_surface_over_collections(spark, store):
    views = store.create_views()
    assert "collections" in views
    n_all = spark.sql("SELECT count(*) AS n FROM collections").first()["n"]
    assert n_all == store.read().count() > 0
    one = views[1]
    rows = spark.sql(
        f"SELECT language, count(*) AS n FROM {one} GROUP BY language"
    ).collect()
    assert rows and all(r["n"] > 0 for r in rows)


def test_upsert_merges_by_key_and_leaves_other_collections(spark, tmp_path):
    import pyspark.sql.functions as F

    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "w")))
    cols = ["doc_id", "source", "folder_name", "text", "language", "chunk_index",
            "chunk_id"]
    base = spark.createDataFrame(
        [(i, "s", "f1" if i < 5 else "f2", f"old text {i}", "english", 0, f"c{i}")
         for i in range(10)],
        cols,
    )
    store.insert_documents(base, embedding_config=EMB)
    before_f2 = {r["chunk_id"]: r["text"] for r in store.read("html_f2").collect()}

    # upsert: replace c1, add c100 — only f1 touched
    delta = spark.createDataFrame(
        [(1, "s", "f1", "NEW text 1", "english", 0, "c1"),
         (100, "s", "f1", "brand new", "english", 0, "c100")],
        cols,
    )
    counts = store.upsert_documents(delta, embedding_config=EMB)
    assert counts == {"html_f1": 6}  # 5 old - 1 replaced + 1 replaced + 1 new
    f1 = {r["chunk_id"]: r["text"] for r in store.read("html_f1").collect()}
    assert f1["c1"] == "NEW text 1" and f1["c100"] == "brand new"
    assert f1["c0"] == "old text 0"  # untouched key survives
    after_f2 = {r["chunk_id"]: r["text"] for r in store.read("html_f2").collect()}
    assert after_f2 == before_f2  # other collection byte-identical


def test_hybrid_rrf_fuses_keyword_and_vector(spark):
    import pyspark.sql.functions as F

    from vectordb_etl_spark.operators.topk import hybrid_rrf_search

    q = [1.0, 0.0, 0.0, 0.0]
    rows = [
        (1, "spark shuffle window spark", [0.0, 1.0, 0.0, 0.0]),  # keyword hit
        (2, "nothing relevant here at all", [1.0, 0.0, 0.0, 0.0]),  # vector hit
        (3, "spark appears once", [0.9, 0.1, 0.0, 0.0]),  # both
        (4, "unrelated text", [0.0, 0.0, 1.0, 0.0]),  # neither
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, embedding array<double>")
    out = hybrid_rrf_search(df, ["spark", "shuffle", "window"], q, k=4).collect()
    order = [r["doc_id"] for r in out]
    # docs with at least one strong rank beat the doc strong on neither
    assert set(order[:3]) == {1, 2, 3} and order[-1] == 4
    by_id = {r["doc_id"]: r for r in out}
    assert by_id[1]["kw_rank"] == 1 and by_id[2]["vec_rank"] == 1
    rrfs = [r["rrf"] for r in out]
    assert rrfs == sorted(rrfs, reverse=True)


def test_connected_components_raises_on_non_convergence(spark):
    from vectordb_etl_spark.operators.dedup import connected_components

    nodes = spark.createDataFrame([(i,) for i in range(1, 8)], ["doc_id"])
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(1, 7)], ["id_a", "id_b"]
    )
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="did not converge"):
        connected_components(nodes, chain, max_iter=2)  # diameter 6 > 2


def test_hybrid_rrf_punctuation_edged_terms_match(spark):
    # "c++" has no word-char trailing edge, so a blind \b suffix anchor
    # could never match; the pattern builder must drop anchors at
    # non-word edges while keeping them at word edges
    from vectordb_etl_spark.operators.topk import hybrid_rrf_search

    q = [1.0, 0.0]
    rows = [
        (1, "we use c++ daily for systems work", [0.0, 1.0]),
        (2, "we use crystal daily for gems", [0.0, 1.0]),   # no c++ hit
        (3, "speaks of cc and c only", [0.0, 1.0]),          # substring guard
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, embedding array<double>")
    out = {r["doc_id"]: r for r in hybrid_rrf_search(df, ["c++"], q, k=3).collect()}
    assert out[1]["kw_rank"] == 1          # c++ matched
    assert out[2]["kw_rank"] > 1 or out[2]["kw_rank"] is None
    # leading \b still applies: "c" inside "crystal"/"cc" must not count
    assert out[3]["kw_rank"] != 1


def test_search_blank_filter_string_falls_back_to_autodetect(spark, tmp_path):
    from vectordb_etl_spark.config import EmbeddingConfig, StoreConfig
    from vectordb_etl_spark.embeddings import with_embeddings
    from vectordb_etl_spark.search import search_with_scores
    from vectordb_etl_spark.store.collections import CollectionStore

    cfg = EmbeddingConfig(dimension=8)
    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "wh")))
    chunks = spark.createDataFrame(
        [("c1", "english office text", "english", "f"),
         ("c2", "한국어 사무실 문서", "korean", "f")],
        "chunk_id string, text string, language string, folder_name string",
    )
    store.insert_documents(with_embeddings(chunks, config=cfg), embed=False)
    # blank filter ≡ no filter: the English query auto-detects to english
    hits = search_with_scores(
        store, "office", k=2, search_all_collections=True,
        filter="   ", embedding_config=cfg,
    )
    assert hits and all(h.metadata["language"] == "english" for h in hits)


def test_upsert_recovers_from_crash_mid_swap(spark, tmp_path):
    # simulate a crash between rename-aside and rename-in: the partition
    # dir is ABSENT and the only copy of the old rows lives in the aside.
    # A retried upsert must restore the aside first — not treat the
    # collection as new and then delete the backup (silent total loss).
    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "w")))
    cols = ["doc_id", "source", "folder_name", "text", "language",
            "chunk_index", "chunk_id"]
    base = spark.createDataFrame(
        [(i, "s", "f1", f"old text {i}", "english", 0, f"c{i}")
         for i in range(5)],
        cols,
    )
    store.insert_documents(base, embedding_config=EMB)

    part = f"{store._data_dir}/collection=html_f1"
    aside = f"{store._data_dir}/.old-collection=html_f1"
    fs = store._fs(part)
    assert fs.rename(store._jpath(part), store._jpath(aside))  # crash state

    delta = spark.createDataFrame(
        [(1, "s", "f1", "NEW text 1", "english", 0, "c1")], cols
    )
    counts = store.upsert_documents(delta, embedding_config=EMB)
    assert counts == {"html_f1": 5}  # 4 surviving old + 1 replaced
    f1 = {r["chunk_id"]: r["text"] for r in store.read("html_f1").collect()}
    assert f1["c1"] == "NEW text 1"
    assert f1["c0"] == "old text 0"  # old rows restored from the aside
    assert not fs.exists(store._jpath(aside))


def test_vacuum_removes_orphans_but_preserves_sole_backups(spark, tmp_path):
    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "w")))
    cols = ["doc_id", "source", "folder_name", "text", "language",
            "chunk_index", "chunk_id"]
    base = spark.createDataFrame(
        [(i, "s", "f1", f"t {i}", "english", 0, f"c{i}") for i in range(3)],
        cols,
    )
    store.insert_documents(base, embedding_config=EMB)
    fs = store._fs(store._data_dir)

    # orphan staging dir (crash before swap) + stale aside NEXT TO a live
    # destination: both garbage
    fs.mkdirs(store._jpath(f"{store._data_dir}/.upsert-collection=html_f1"))
    fs.mkdirs(store._jpath(f"{store._data_dir}/.old-collection=html_f1"))
    # an aside whose destination is ABSENT: the sole backup — must survive
    fs.mkdirs(store._jpath(f"{store._data_dir}/.old-collection=html_gone"))

    # default grace window: freshly-written work dirs look like an in-flight
    # writer's staging area and must be SKIPPED (ADVICE r03 — a concurrent
    # vacuum must not race an upsert that is about to rename its staging dir)
    assert store.vacuum() == []
    removed = sorted(store.vacuum(grace_s=0))
    assert removed == [
        ".old-collection=html_f1", ".upsert-collection=html_f1",
    ]
    assert fs.exists(
        store._jpath(f"{store._data_dir}/.old-collection=html_gone")
    )
    # live data untouched
    assert store.read("html_f1").count() == 3


def test_upsert_recovers_from_crashed_compaction_aside(spark, tmp_path):
    # CROSS-mechanism recovery: a compaction crash leaves a .precompact-
    # aside; a later UPSERT must restore it (not recreate the collection
    # with delta-only rows and let vacuum destroy the backup)
    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "w")))
    cols = ["doc_id", "source", "folder_name", "text", "language",
            "chunk_index", "chunk_id"]
    base = spark.createDataFrame(
        [(i, "s", "f1", f"old text {i}", "english", 0, f"c{i}")
         for i in range(4)],
        cols,
    )
    store.insert_documents(base, embedding_config=EMB)
    part = f"{store._data_dir}/collection=html_f1"
    aside = f"{store._data_dir}/.precompact-collection=html_f1"
    fs = store._fs(part)
    assert fs.rename(store._jpath(part), store._jpath(aside))  # crash state

    delta = spark.createDataFrame(
        [(9, "s", "f1", "brand new", "english", 0, "c9")], cols
    )
    counts = store.upsert_documents(delta, embedding_config=EMB)
    assert counts == {"html_f1": 5}  # 4 restored + 1 new
    f1 = {r["chunk_id"] for r in store.read("html_f1").collect()}
    assert f1 == {"c0", "c1", "c2", "c3", "c9"}


def test_drop_collection_removes_asides(spark, tmp_path):
    # dropping a collection must also clear its swap work dirs, or the next
    # upsert's crash recovery would resurrect the dropped rows
    store = CollectionStore(spark, StoreConfig(warehouse_dir=str(tmp_path / "w")))
    cols = ["doc_id", "source", "folder_name", "text", "language",
            "chunk_index", "chunk_id"]
    base = spark.createDataFrame(
        [(0, "s", "f1", "dropped text", "english", 0, "c0")], cols
    )
    store.insert_documents(base, embedding_config=EMB)
    part = f"{store._data_dir}/collection=html_f1"
    aside = f"{store._data_dir}/.old-collection=html_f1"
    fs = store._fs(part)
    assert fs.rename(store._jpath(part), store._jpath(aside))  # crash state

    store.drop_collection("html_f1")
    assert not fs.exists(store._jpath(aside))

    delta = spark.createDataFrame(
        [(1, "s", "f1", "fresh", "english", 0, "c1")], cols
    )
    counts = store.upsert_documents(delta, embedding_config=EMB)
    assert counts == {"html_f1": 1}  # dropped rows did NOT come back


def test_integrity_checks_fire_on_planted_violations(spark):
    """The validation checks must actually COUNT violations, not just
    report zeros on clean data: plant two orphan rows and a duplicated
    primary key and assert the exact counts."""
    from vectordb_etl_spark.store.validation import (
        integrity_report,
        orphan_check,
        unique_check,
    )

    parent = spark.createDataFrame([(1,), (2,)], ["pk"])
    child = spark.createDataFrame(
        [(1, 10), (2, 11), (99, 12), (98, 13), (None, 14)], ["fk", "x"]
    )
    dup = spark.createDataFrame([(1,), (1,), (2,), (3,), (3,)], ["k"])
    # a NULL parent key must not flip the orphan count to zero (the
    # NOT-IN three-valued-logic trap); NULL child keys are not violations
    # (dbt relationship-test convention)
    parent_with_null = spark.createDataFrame([(1,), (2,), (None,)], ["pk"])
    rows = {
        r["check_name"]: r["violations"]
        for r in integrity_report(
            [
                orphan_check("orphans", child, "fk", parent, "pk"),
                orphan_check(
                    "orphans_null_parent", child, "fk", parent_with_null, "pk"
                ),
                unique_check("dups", dup, "k"),
                unique_check("clean", parent, "pk"),
            ]
        ).collect()
    }
    assert rows == {
        "orphans": 2,  # 99 and 98; the NULL child key is excluded
        "orphans_null_parent": 2,
        "dups": 2,
        "clean": 0,
    }


# --------------------------------------------------------------------------
# Dynamic metadata fields — enable_dynamic_field parity (VERDICT r10 item 1;
# reference modules/milvus_store.py:62-66)
# --------------------------------------------------------------------------


def test_fold_dynamic_meta_schema_and_precedence(spark):
    from vectordb_etl_spark.store.collections import fold_dynamic_meta

    df = spark.createDataFrame(
        [(1, "a", "x", 3, {"k": "v", "rating": "stale"}), (2, "b", "y", 7, None)],
        "doc_id long, text string, rating string, extra_n int, "
        "meta map<string,string>",
    )
    out = fold_dynamic_meta(df)
    assert set(out.columns) == {"doc_id", "text", "meta"}
    assert dict(out.schema["meta"].dataType.jsonValue(),) == {
        "type": "map", "keyType": "string", "valueType": "string",
        "valueContainsNull": True,
    }
    rows = {r["doc_id"]: r["meta"] for r in out.collect()}
    # typed column wins over a stale pre-existing meta key; existing
    # non-colliding keys survive; NULL pre-existing meta coalesces
    assert rows[1] == {"k": "v", "rating": "x", "extra_n": "3"}
    assert rows[2] == {"rating": "y", "extra_n": "7"}
    # no extras at all -> empty (not null) map, stable schema
    none = fold_dynamic_meta(df.select("doc_id", "text"))
    assert none.collect()[0]["meta"] == {}


def test_dynamic_meta_store_roundtrip_and_facade(spark, docs_tiny, tmp_path):
    """Insert docs carrying extra loader-specific fields with
    dynamic_meta=True; the parquet schema stays fixed, a Milvus-style
    filter string naming the dynamic field directly reaches the meta map,
    and hits surface dynamic fields as top-level metadata keys."""
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    docs = docs_tiny.select(
        "doc_id",
        "source",
        F.col("source").alias("folder_name"),
        "text",
        detect_language_content_col("text").alias("language"),
        F.lit("crawler-7").alias("ingest_job"),      # dynamic
        (F.col("doc_id") % 3).alias("shard_hint"),   # dynamic, numeric
    ).limit(20)
    store.insert_documents(
        docs, embedding_config=EMB, mode="overwrite", dynamic_meta=True
    )
    back = store.read()
    assert "ingest_job" not in back.columns and "meta" in back.columns

    hits = search_with_scores(
        store, "query", k=3, embedding_config=EMB,
        filter='ingest_job == "crawler-7" and shard_hint >= 1',
    )
    assert len(hits) == 3
    for h in hits:
        assert h.metadata["ingest_job"] == "crawler-7"
        assert int(h.metadata["shard_hint"]) >= 1
        assert "meta" not in h.metadata  # flattened, not nested

    # upsert path folds too and merges into the same stable schema
    more = docs.limit(5).withColumn("ingest_job", F.lit("crawler-8"))
    store.upsert_documents(
        more, key_col="doc_id", embedding_config=EMB, dynamic_meta=True
    )
    re = store.read()
    assert "ingest_job" not in re.columns
    n8 = re.filter(F.col("meta")["ingest_job"] == "crawler-8").count()
    assert n8 == 5


def test_mixed_schema_warehouse_needs_merge_schema(spark, docs_tiny, tmp_path):
    """A warehouse mixing pre-meta and dynamic-meta batches: the default
    read may resolve a footer without `meta`; read(merge_schema=True)
    must surface it."""
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    base = docs_tiny.select(
        "doc_id", "source", F.lit("old").alias("folder_name"), "text",
        F.lit("english").alias("language"),
    ).limit(5)
    store.insert_documents(base, embedding_config=EMB)            # no meta
    store.insert_documents(                                        # meta
        base.withColumn("folder_name", F.lit("new"))
        .withColumn("batch_tag", F.lit("b7")),
        embedding_config=EMB, dynamic_meta=True,
    )
    merged = store.read(merge_schema=True)
    assert "meta" in merged.columns
    tagged = merged.filter(F.col("meta")["batch_tag"] == "b7")
    assert tagged.count() == 5
    # pre-meta rows read back with NULL meta, not an error
    assert merged.filter(F.col("meta").isNull()).count() == 5

    # merge_schema must reach the EXACT search paths too, not just the
    # facade's schema probe: a dynamic-field filter on this mixed
    # warehouse through (a) the non-indexed exact path and (b) the
    # fanout exact fallback (index_kind set, no index built) must both
    # resolve `meta` and return only the tagged rows
    exact = search_with_scores(
        store, "query", k=10, embedding_config=EMB,
        filter='batch_tag == "b7"', merge_schema=True,
    )
    assert len(exact) == 5
    assert all(h.metadata["batch_tag"] == "b7" for h in exact)
    fb = search_with_scores(
        store, "query", k=10, embedding_config=EMB,
        filter='batch_tag == "b7"', merge_schema=True, index_kind="ivf",
    )
    assert [h.metadata.get("doc_id") for h in fb] == [
        h.metadata.get("doc_id") for h in exact
    ]


def test_collection_name_col_empty_folder_matches_python_twin(spark):
    """'' folders must land in '<prefix>_documents' on BOTH twins: the
    Python rule treats '' as falsy (config.py:81), so the column rule
    must too — otherwise the two disagree on where data lives."""
    from vectordb_etl_spark.store.collections import collection_name_col

    cfg = StoreConfig()
    cases = [None, "", "root", "My-Folder", "a b"]
    df = spark.createDataFrame(
        [(f,) for f in cases], "folder string"
    ).withColumn("c", collection_name_col(cfg.collection_prefix, F.col("folder")))
    got = {r["folder"]: r["c"] for r in df.collect()}
    for f in cases:
        assert got[f] == cfg.collection_name(f), f"folder={f!r}"


def test_dynamic_meta_filter_through_ivf_index(spark, docs_tiny, tmp_path):
    """Milvus composes dynamic-field exprs WITH the index
    (milvus_store.py:62-66 + 254-299): a dynamic-meta filter string must
    work through index_kind='ivf' too — the meta map rides the index
    layout and the predicate applies above the pruned probe scan."""
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    docs = docs_tiny.select(
        "doc_id", "source", F.lit("f1").alias("folder_name"), "text",
        detect_language_content_col("text").alias("language"),
        (F.col("doc_id") % 3).alias("shard_hint"),   # dynamic
    ).limit(30)
    store.insert_documents(docs, embedding_config=EMB, dynamic_meta=True)
    store.build_index("html_f1", kind="ivf", nlist=4, max_iter=3)
    hits = search_with_scores(
        store, "query", k=3, embedding_config=EMB,
        index_kind="ivf", nprobe=4, filter="shard_hint == 1",
    )
    assert len(hits) == 3
    assert all(h.metadata["shard_hint"] == "1" for h in hits)
    # exact path with the same dynamic filter ranks identically at
    # probe-all (nprobe=nlist makes the indexed path exact)
    exact = search_with_scores(
        store, "query", k=3, embedding_config=EMB, filter="shard_hint == 1",
    )
    assert [round(h.score, 6) for h in hits] == [
        round(h.score, 6) for h in exact
    ]


def test_insert_returns_batch_counts_not_warehouse_totals(spark, tmp_path):
    """Reference parity (milvus_store.py:176-234 accumulates per-batch
    inserted counts): a second append must report ITS rows, not the
    warehouse total — and the count must come from the batch, never a
    post-write scan of every collection."""
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    df = spark.createDataFrame(
        [(i, "s", "f1", f"text {i}", "english", 0) for i in range(10)],
        ["doc_id", "source", "folder_name", "text", "language", "chunk_index"],
    )
    first = store.insert_documents(df, embedding_config=EMB)
    assert first == {"html_f1": 10}
    second = store.insert_documents(df.limit(3), embedding_config=EMB)
    assert second == {"html_f1": 3}          # batch, not 13
    assert store.read("html_f1").count() == 13  # warehouse total intact


def test_dynamic_meta_filter_through_graph_index(spark, docs_tiny, tmp_path):
    """The graph tier carries the dynamic meta map too: build_index's
    default passthrough includes it, post AND traversal (ACORN) filter
    modes accept a dynamic-field filter string, and hits flatten the
    dynamic keys — full-beam edge makes both modes exact."""
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    docs = docs_tiny.select(
        "doc_id", "source", F.lit("f1").alias("folder_name"), "text",
        detect_language_content_col("text").alias("language"),
        (F.col("doc_id") % 3).alias("grp"),   # dynamic
    ).limit(30)
    store.insert_documents(docs, embedding_config=EMB, dynamic_meta=True)
    store.build_index(
        "html_f1", kind="graph", id_col="doc_id",
        num_shards=2, m=4, ef_construction=20,
    )
    exact = search_with_scores(
        store, "query", k=3, embedding_config=EMB, filter="grp == 1",
    )
    for mode in ("post", "traversal"):
        hits = search_with_scores(
            store, "query", k=3, embedding_config=EMB,
            index_kind="graph", ef=1_000_000, filter="grp == 1",
            filter_mode=mode,
        )
        assert [round(h.score, 6) for h in hits] == [
            round(h.score, 6) for h in exact
        ], mode
        assert all(h.metadata["grp"] == "1" for h in hits)
        assert all("meta" not in h.metadata for h in hits)


def test_dynamic_field_stats_introspection(spark, docs_tiny, tmp_path):
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    docs = docs_tiny.select(
        "doc_id", "source", F.lit("f1").alias("folder_name"), "text",
        F.lit("english").alias("language"),
        (F.col("doc_id") % 4).alias("grp"),
        F.lit("crawl9").alias("job"),
    ).limit(20)
    store.insert_documents(docs, embedding_config=EMB, dynamic_meta=True)
    stats = {
        r["key"]: (r["n_rows"], r["n_values"])
        for r in store.dynamic_field_stats().collect()
    }
    assert stats == {"grp": (20, 4), "job": (20, 1)}
    # store without a meta column: empty result, stable schema, no error
    bare = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w2"))
    )
    bare.insert_documents(docs.drop("grp", "job"), embedding_config=EMB)
    empty = bare.dynamic_field_stats()
    assert empty.count() == 0
    assert empty.columns == ["key", "n_rows", "n_values"]


def test_collection_naming_rule_matches_reference(spark, tmp_path):
    """Reference MilvusConfig.get_collection_name (modules/config.py:37-43):
    lowercase, '-'/' ' -> '_', 'root' folder -> the default
    '<prefix>_documents' collection — applied identically by the config
    helper (driver-side) and the sink column (JVM-side)."""
    from vectordb_etl_spark.config import StoreConfig as SC

    cfg = SC()
    assert cfg.collection_name("My-Docs Files") == "html_my_docs_files"
    assert cfg.collection_name("root") == "html_documents"
    assert cfg.collection_name(None) == "html_documents"
    assert cfg.collection_name("plain") == "html_plain"

    store = CollectionStore(spark, SC(warehouse_dir=str(tmp_path / "w")))
    df = spark.createDataFrame(
        [(1, "s", "My-Docs Files", "t", "english", 0),
         (2, "s", "root", "u", "english", 0)],
        ["doc_id", "source", "folder_name", "text", "language", "chunk_index"],
    )
    counts = store.insert_documents(df, embedding_config=EMB)
    assert set(counts) == {"html_my_docs_files", "html_documents"}
    assert store.list_collections() == ["html_documents", "html_my_docs_files"]


def test_graph_exact_fallback_with_meta_output_cols(spark, docs_tiny, tmp_path):
    """Code-review r11: the graph-kind EXACT fallback (un-indexed
    collection served by brute force) used output_cols as topk_search
    tie-breakers — with dynamic meta in output_cols that was an orderBy
    on a MapType. Must serve, return dynamic fields, and rank like the
    plain exact facade."""
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    docs = docs_tiny.select(
        "doc_id", "source", F.lit("f1").alias("folder_name"), "text",
        detect_language_content_col("text").alias("language"),
        (F.col("doc_id") % 3).alias("grp"),
    ).limit(20)
    store.insert_documents(docs, embedding_config=EMB, dynamic_meta=True)
    # NO graph index built: index_kind='graph' takes the exact fallback
    hits = search_with_scores(
        store, "query", k=3, embedding_config=EMB,
        index_kind="graph", ef=1_000_000,
    )
    exact = search_with_scores(store, "query", k=3, embedding_config=EMB)
    assert [round(h.score, 6) for h in hits] == [
        round(h.score, 6) for h in exact
    ]
    assert all("grp" in h.metadata for h in hits)


def test_pre_naming_rule_partition_warns(spark, tmp_path):
    """Code-review r11: a warehouse written before the naming rule holds
    collection=html_My-Docs / collection=html_root style partitions; a
    post-rule insert targeting the sanitized names must WARN about the
    split instead of silently leaving duplicate-key twins behind."""
    import shutil
    import warnings as w

    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    df = spark.createDataFrame(
        [(1, "s", "my_docs", "t", "english", 0),
         (2, "s", "plain", "u", "english", 0)],
        ["doc_id", "source", "folder_name", "text", "language", "chunk_index"],
    )
    store.insert_documents(df, embedding_config=EMB)
    # forge pre-rule spellings next to the sanitized ones
    base = tmp_path / "w" / "collections"
    shutil.copytree(base / "collection=html_my_docs",
                    base / "collection=html_My-Docs")
    shutil.copytree(base / "collection=html_plain",
                    base / "collection=html_root")
    with pytest.warns(UserWarning, match="pre-naming-rule"):
        store.insert_documents(df.filter(F.col("doc_id") == 1),
                               embedding_config=EMB)
    no_folder = df.drop("folder_name")  # targets the html_documents default
    with pytest.warns(UserWarning, match="html_root"):
        store.upsert_documents(no_folder, key_col="doc_id",
                               embedding_config=EMB)


def test_insert_count_rows_false_skips_count(spark, tmp_path):
    store = CollectionStore(
        spark, StoreConfig(warehouse_dir=str(tmp_path / "w"))
    )
    df = spark.createDataFrame(
        [(1, "s", "f1", "t", "english", 0)],
        ["doc_id", "source", "folder_name", "text", "language", "chunk_index"],
    )
    out = store.insert_documents(df, embedding_config=EMB, count_rows=False)
    assert out == {}
    assert store.read("html_f1").count() == 1
