"""Graph ANN — per-shard navigable-small-world index (operator X2-analog).

The reference's non-default index is Milvus HNSW with M=16,
efConstruction=200, ef_search=100 (modules/milvus_store.py:115-124, params
modules/config.py:26-27). Spark has no native graph-ANN, so the idiomatic
mapping is the standard SHARDED graph index:

- **build**: rows are hashed into shards (``num_shards`` ≈ executor
  parallelism); one ``applyInPandas`` group per shard builds an in-memory
  NSW graph (greedy insert: each node links to its M nearest among already-
  inserted nodes, links are bidirectional) and emits the adjacency as a
  plain ``array<int>`` column. The index IS a parquet table partitioned by
  ``shard`` — same "index as data layout" stance as IVFIndex.
- **search**: every shard runs best-first beam search (result heap of
  ``ef``, expand the closest unexpanded candidate's neighbors, stop when
  the closest candidate is worse than the worst of a full heap) over its
  local graph — one ``applyInPandas`` over the index table, no shuffle of
  vectors — and emits its local top-k; a global ``orderBy().limit(k)``
  (TakeOrderedAndProject over shards×k tiny rows) merges.

Scale shape: sharded HNSW searches ALL shards (no cross-shard routing —
exactly how Milvus distributes HNSW across segments); the win over brute
force is WITHIN each shard: beam search evaluates ~ef·M vectors instead of
n/num_shards. Build is one shuffle (hash into shards) + embarrassingly
parallel in-memory graph construction; shard size is bounded by
num_shards, which the caller scales with the data (n/num_shards must fit
one task's memory — the same contract any HNSW segment has).

Exactness edge for the oracle: the insert rule links every new node into
the existing component, so the graph is CONNECTED; with ``ef >= shard
size`` the termination test can never prune (the result heap only fills
when every node has been visited), so beam search degenerates to an exact
scan of the shard and the merged result equals brute-force top-k. The
driver's ``graph_topk`` query runs that edge; recall at the design point
(ef=100) is covered by tests/test_ann.py.
"""

from __future__ import annotations

import heapq

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def _normalize_rows(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    return mat / np.maximum(norms, 1e-12)


def extend_nsw(
    mat: np.ndarray,
    adj: list[list[int]],
    start: int,
    m: int = 16,
    ef_construction: int = 200,
) -> list[list[int]]:
    """Continue greedy NSW insertion from node ``start`` over an existing
    adjacency (``build_nsw`` is the ``start=1``/empty-adjacency case —
    NSW insertion is inherently incremental, which is what makes graph
    segments extendable)."""
    n = mat.shape[0]
    for i in range(start, n):
        if i <= m:
            nearest = list(range(i))
        else:
            cand = beam_search(mat, adj, mat[i], ef=max(ef_construction, m), n_nodes=i)
            nearest = [node for _, node in cand[:m]]
        for j in nearest:
            adj[i].append(j)
            adj[j].append(i)
    return adj


def build_nsw(mat: np.ndarray, m: int = 16, ef_construction: int = 200) -> list[list[int]]:
    """Greedy NSW construction over unit vectors (cosine ≡ dot): insert
    nodes one by one, linking each to its ``m`` nearest among the already-
    inserted set found via beam search (ef_construction beam), links made
    bidirectional. Pure numpy — runs inside one Spark task per shard."""
    n = mat.shape[0]
    return extend_nsw(mat, [[] for _ in range(n)], 1, m, ef_construction)


def beam_search(
    mat: np.ndarray,
    adj: list[list[int]],
    query: np.ndarray,
    ef: int,
    n_nodes: int | None = None,
    entry: int = 0,
) -> list[tuple[float, int]]:
    """Best-first search: returns up to ``ef`` (score, node) pairs sorted by
    descending dot score. Visits only reachable nodes; with ``ef >= n`` it
    visits the entire connected component (exactness edge)."""
    n = n_nodes if n_nodes is not None else mat.shape[0]
    if n == 0:
        return []
    start = min(entry, n - 1)
    s0 = float(mat[start] @ query)
    visited = {start}
    # candidates: max-heap by score (python heapq is min-heap → negate)
    candidates = [(-s0, start)]
    # results: min-heap of (score, node), size-capped at ef
    results = [(s0, start)]
    while candidates:
        neg_s, node = heapq.heappop(candidates)
        if len(results) >= ef and -neg_s < results[0][0]:
            break  # closest candidate can't improve a full result heap
        for nb in adj[node]:
            if nb >= n or nb in visited:
                continue
            visited.add(nb)
            s = float(mat[nb] @ query)
            if len(results) < ef:
                heapq.heappush(results, (s, nb))
                heapq.heappush(candidates, (-s, nb))
            elif s > results[0][0]:
                heapq.heapreplace(results, (s, nb))
                heapq.heappush(candidates, (-s, nb))
    # score desc, node ASC on ties (nodes are id-ordered positions, so this
    # matches the oracle's `ORDER BY score DESC, vec_id ASC` tie rule)
    return sorted(results, key=lambda t: (-t[0], t[1]))


class GraphANNIndex:
    """Sharded NSW index as partitioned parquet:
    ``<path>/shard=<i>/...`` rows ``(id, <passthrough...>, embedding,
    neighbors array<int>)`` — neighbors are LOCAL row positions within the
    shard (stable because search reloads the shard in one group)."""

    def __init__(self, spark: SparkSession, path: str, metric: str = "COSINE"):
        if metric.upper() != "COSINE":
            raise ValueError("graph ANN tier implements the COSINE contract")
        self.spark = spark
        self.path = path

    def build(
        self,
        df: DataFrame,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        num_shards: int | None = None,
        m: int = 16,
        ef_construction: int = 200,
        passthrough: list[str] | None = None,
        target_rows_per_shard: int = 100_000,
    ) -> "GraphANNIndex":
        """Memory contract: each shard is materialized as ONE pandas
        DataFrame (vectors + adjacency) inside ``applyInPandas`` and the
        NSW build is O(shard_rows · ef_construction) dot products — the
        shard's ROW COUNT is the knob that must fit a task. When
        ``num_shards`` is None (default) it is derived from a cheap
        ``df.count()`` so no shard expects more than
        ``target_rows_per_shard`` rows (hash sharding is uniform in
        ``id_col``, so shard sizes concentrate tightly around
        n/num_shards). Pass explicit ``num_shards`` to skip the count job
        or to pin the layout for an external oracle."""
        passthrough = passthrough or []
        if num_shards is None:
            n = df.select(id_col).count()
            num_shards = max(1, -(-n // target_rows_per_shard))
        tagged = df.select(
            F.col(id_col).alias("id"),
            *[F.col(c) for c in passthrough],
            F.col(emb_col).cast("array<double>").alias("embedding"),
            F.pmod(F.hash(F.col(id_col)), F.lit(num_shards)).alias("shard"),
        )
        pass_fields = ", ".join(
            f"`{c}` {tagged.schema[c].dataType.simpleString()}" for c in passthrough
        )
        out_schema = (
            "shard int, id long, "
            + (pass_fields + ", " if pass_fields else "")
            + "pos int, embedding array<double>, neighbors array<int>"
        )

        def _build(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("id").reset_index(drop=True)
            mat = _normalize_rows(np.stack(pdf["embedding"].to_numpy()))
            adj = build_nsw(mat, m=m, ef_construction=ef_construction)
            out = {
                "shard": pdf["shard"],
                "id": pdf["id"],
                **{c: pdf[c] for c in passthrough},
                "pos": np.arange(len(pdf), dtype=np.int32),
                "embedding": list(mat),
                "neighbors": [np.asarray(a, dtype=np.int32) for a in adj],
            }
            return pd.DataFrame(out)

        tagged.groupBy("shard").applyInPandas(_build, out_schema).write.mode(
            "overwrite"
        ).partitionBy("shard").parquet(self.path)
        return self

    def add(
        self,
        df: DataFrame,
        id_col: str = "vec_id",
        emb_col: str = "embedding",
        num_shards: int | None = None,
        m: int = 16,
        ef_construction: int = 200,
        passthrough: list[str] | None = None,
        target_rows_per_shard: int = 100_000,
    ) -> "GraphANNIndex":
        """Incremental maintenance via the SEGMENT model — how Milvus
        absorbs inserts into an HNSW collection: the batch builds NEW
        self-contained NSW shards whose ids are offset past the existing
        layout, appended to the parquet table. ``search``/``search_many``
        already fan over every shard and merge, so appended segments are
        immediately searchable, the probe-all exactness edge is preserved
        (each segment is internally connected), and EXISTING shard files
        are never rewritten — cost ∝ batch, never the corpus. Periodic
        ``build()`` over the full set is the seal/merge compaction analog
        when small segments accumulate.

        The batch must carry the same passthrough columns the index was
        built with (schema is checked against the existing layout)."""
        passthrough = passthrough or []
        existing = self.spark.read.parquet(self.path)
        expected = [
            c for c in existing.columns
            if c not in ("shard", "id", "pos", "embedding", "neighbors")
        ]
        if sorted(expected) != sorted(passthrough):
            raise ValueError(
                f"passthrough {passthrough} != existing layout's {expected}"
            )
        base = existing.agg(F.max("shard")).head()[0] + 1
        if num_shards is None:
            n = df.select(id_col).count()
            num_shards = max(1, -(-n // target_rows_per_shard))
        tagged = df.select(
            F.col(id_col).alias("id"),
            *[F.col(c) for c in passthrough],
            F.col(emb_col).cast("array<double>").alias("embedding"),
            (F.lit(base) + F.pmod(F.hash(F.col(id_col)), F.lit(num_shards))).alias(
                "shard"
            ),
        )
        pass_fields = ", ".join(
            f"`{c}` {tagged.schema[c].dataType.simpleString()}" for c in passthrough
        )
        out_schema = (
            "shard int, id long, "
            + (pass_fields + ", " if pass_fields else "")
            + "pos int, embedding array<double>, neighbors array<int>"
        )

        def _build(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("id").reset_index(drop=True)
            mat = _normalize_rows(np.stack(pdf["embedding"].to_numpy()))
            adj = build_nsw(mat, m=m, ef_construction=ef_construction)
            out = {
                "shard": pdf["shard"],
                "id": pdf["id"],
                **{c: pdf[c] for c in passthrough},
                "pos": np.arange(len(pdf), dtype=np.int32),
                "embedding": list(mat),
                "neighbors": [np.asarray(a, dtype=np.int32) for a in adj],
            }
            return pd.DataFrame(out)

        tagged.groupBy("shard").applyInPandas(_build, out_schema).write.mode(
            "append"
        ).partitionBy("shard").parquet(self.path)
        return self

    def compact(
        self,
        num_shards: int | None = None,
        m: int = 16,
        ef_construction: int = 200,
        target_rows_per_shard: int = 100_000,
    ) -> tuple[int, int]:
        """Seal/merge the accumulated ``add()`` segments back into a fresh
        uniform layout (the Milvus segment-compaction analog): read every
        shard's vectors, re-shard by the id hash, rebuild per-shard NSW
        graphs, and swap the layout in one overwrite. Returns
        ``(shards_before, shards_after)``. Run when small segments
        accumulate — per-segment beam searches stay correct regardless,
        but many tiny segments waste task overhead and beam quality."""
        existing = self.spark.read.parquet(self.path)
        passthrough = [
            c for c in existing.columns
            if c not in ("shard", "id", "pos", "embedding", "neighbors")
        ]
        before = existing.select("shard").distinct().count()
        vectors = existing.select(
            F.col("id").alias("vec_id"), *passthrough, "embedding"
        )
        # materialize before the overwrite clobbers the source files
        staged = f"{self.path}__compact_staging"
        vectors.write.mode("overwrite").parquet(staged)
        self.build(
            self.spark.read.parquet(staged),
            id_col="vec_id",
            num_shards=num_shards,
            m=m,
            ef_construction=ef_construction,
            passthrough=passthrough,
            target_rows_per_shard=target_rows_per_shard,
        )
        from vectordb_etl_spark.store.collections import checked_delete

        jpath = self.spark._jvm.org.apache.hadoop.fs.Path(staged)
        fs = jpath.getFileSystem(self.spark._jsc.hadoopConfiguration())
        checked_delete(fs, jpath)
        after = (
            self.spark.read.parquet(self.path).select("shard").distinct().count()
        )
        return before, after

    def search(
        self,
        query: list[float],
        k: int = 3,
        ef: int = 100,
        output_cols: list[str] | None = None,
        score_name: str = "score",
        round_dp: int = 6,
        predicate=None,
    ) -> DataFrame:
        """``predicate`` enables FILTERED graph search with the standard
        post-filter strategy (what HNSW libraries do for scalar filters:
        traverse unfiltered — filtering during traversal disconnects the
        graph — then filter the candidate set): each shard emits its full
        ef-beam instead of just top-k, the predicate prunes the merged
        candidates, and the global top-k ranks what passes. Size ``ef``
        to the filter's selectivity (candidates ≈ ef × pass-rate); at the
        full-beam edge (ef ≥ shard size) the result is EXACTLY the
        filtered brute force, which is what the oracle checks. The
        predicate may only reference ``output_cols``."""
        q = np.asarray(query, dtype=np.float64)
        q = q / max(float(np.linalg.norm(q)), 1e-12)
        out_cols = output_cols or ["id"]
        idx = self.spark.read.parquet(self.path)
        pass_fields = ", ".join(
            f"`{c}` {idx.schema[c].dataType.simpleString()}" for c in out_cols
        )
        out_schema = f"{pass_fields}, {score_name} double"
        k_, ef_ = k, ef
        emit = max(ef, k) if predicate is not None else k

        def _search(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("pos").reset_index(drop=True)
            mat = np.stack(pdf["embedding"].to_numpy())
            adj = [list(a) for a in pdf["neighbors"]]
            hits = beam_search(mat, adj, q, ef=max(ef_, k_))[:emit]
            rows = [pdf.iloc[node] for _, node in hits]
            return pd.DataFrame(
                {
                    **{c: [r[c] for r in rows] for c in out_cols},
                    score_name: [round(s, round_dp) for s, _ in hits],
                }
            )

        local = idx.groupBy("shard").applyInPandas(_search, out_schema)
        if predicate is not None:
            local = local.filter(predicate)
        return local.orderBy(
            F.desc(score_name), *[F.asc(c) for c in out_cols]
        ).limit(k)

    def search_many(
        self,
        queries: list[list[float]],
        k: int = 3,
        ef: int = 100,
        output_cols: list[str] | None = None,
        score_name: str = "score",
        round_dp: int = 6,
    ) -> DataFrame:
        """Batched serving: N queries beam-searched in ONE job — each shard
        group loads its graph once and answers every query against it
        (amortizing the shard load + adjacency rebuild that dominate
        per-query jobs), then one rank-over-window takes each query's
        global top-k from the shards×N×k candidate rows. The query matrix
        ships in the UDF closure — fine for serving-sized batches (cap
        ~thousands); larger batches should chunk. Returns
        (query_id, *output_cols, score), k rows per query."""
        qmat = _normalize_rows(np.asarray(queries, dtype=np.float64))
        out_cols = output_cols or ["id"]
        idx = self.spark.read.parquet(self.path)
        pass_fields = ", ".join(
            f"`{c}` {idx.schema[c].dataType.simpleString()}" for c in out_cols
        )
        out_schema = f"query_id int, {pass_fields}, {score_name} double"
        k_, ef_ = k, ef

        def _search(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values("pos").reset_index(drop=True)
            mat = np.stack(pdf["embedding"].to_numpy())
            adj = [list(a) for a in pdf["neighbors"]]
            frames = []
            for qi in range(qmat.shape[0]):
                hits = beam_search(mat, adj, qmat[qi], ef=max(ef_, k_))[:k_]
                rows = [pdf.iloc[node] for _, node in hits]
                frames.append(
                    pd.DataFrame(
                        {
                            "query_id": [qi] * len(hits),
                            **{c: [r[c] for r in rows] for c in out_cols},
                            score_name: [round(s, round_dp) for s, _ in hits],
                        }
                    )
                )
            return pd.concat(frames, ignore_index=True)

        from pyspark.sql.window import Window

        local = idx.groupBy("shard").applyInPandas(_search, out_schema)
        order = [F.desc(score_name)] + [F.asc(c) for c in out_cols]
        w = Window.partitionBy("query_id").orderBy(*order)
        return (
            local.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn")
            .orderBy("query_id", *order)
        )
