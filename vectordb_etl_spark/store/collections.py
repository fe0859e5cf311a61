"""Collection store — operators S8/S9/S10/A11/X3 (SURVEY.md §2.1, §2.7).

The reference keeps one Milvus collection per source folder
(modules/milvus_store.py:138-174, name rule modules/config.py:37-43). Here a
"collection" is a value of the ``collection`` partition column of ONE
parquet dataset under the warehouse root — the 100 TB layout from SURVEY.md
§1.4: naming a collection ⇒ partition pruning; fan-out search ⇒ simply no
filter (one scan, no per-collection loop, no re-embedding).

Durability mapping: Milvus ``flush`` (milvus_store.py:232) ≅ the atomic
parquet job commit; ``load_collection`` (milvus_store.py:72-76) ≅ optional
``cache()``.

DDL (list/exists/drop/reset) goes through the Hadoop FileSystem API resolved
from the warehouse URI — NOT ``pathlib``/``shutil`` — so the same code works
when the warehouse root is ``s3a://``/``hdfs://``/``file:`` (the 100 TB
deployment this module's layout is designed for). Schemeless paths resolve
to absolute local paths, preserving the local behavior.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from vectordb_etl_spark.config import EmbeddingConfig, StoreConfig
from vectordb_etl_spark.embeddings import with_embeddings
from vectordb_etl_spark.functions.text import truncate_cols
from vectordb_etl_spark.store.snapshots import (
    manifest_versions,
    read_manifest,
    try_commit_manifest,
)


# The declared document/chunk schema — the analog of the reference's fixed
# FieldSchema list (modules/milvus_store.py:47-66: id/text/embedding/source/
# filename/language/chunk_index/total_chunks/chunk_size_chars/
# chunk_size_tokens) plus this engine's own typed metadata columns
# (SURVEY.md §1.4). Anything OUTSIDE this set is a "dynamic field" in the
# reference's sense (enable_dynamic_field=True, milvus_store.py:62-66).
DOCUMENT_FIXED_COLS = frozenset({
    "id", "doc_id", "chunk_id", "text", "embedding",
    "source", "filename", "folder_name", "file_type", "file_size",
    "modified_time", "title", "author", "subject", "keywords",
    "language", "char_count",
    "heading_count", "paragraph_count", "table_count", "list_count",
    "n_sections", "chunk_index", "total_chunks", "chunk_size_chars",
    "chunk_size_tokens", "collection", "meta",
})


def fold_dynamic_meta(
    df: DataFrame,
    fixed_cols=None,
    meta_col: str = "meta",
) -> DataFrame:
    """``enable_dynamic_field=True`` parity (reference
    modules/milvus_store.py:62-66): columns OUTSIDE the declared schema
    fold into a ``meta: map<string,string>`` column — Milvus's hidden
    ``$meta`` JSON field, re-expressed as Spark's native map type so the
    parquet schema stays STABLE across heterogeneous loader batches
    (appending typed one-off columns to an existing dataset makes them
    invisible to later non-mergeSchema reads; a map column does not).

    Values are stringified (map<string,string> — the lowest common
    denominator across loaders); numeric comparisons on dynamic keys cast
    back at filter time (functions/filter_expr.py). An existing
    ``meta_col`` map is preserved and merged, with the folded typed
    columns winning on key collision. Pure column expressions — map-side,
    no shuffle, no UDF."""
    fixed = (
        frozenset(fixed_cols) if fixed_cols is not None else DOCUMENT_FIXED_COLS
    )
    extras = [c for c in df.columns if c not in fixed and c != meta_col]
    empty = F.expr("map()").cast("map<string,string>")
    folded = (
        F.create_map(
            *[x for c in extras for x in (F.lit(c), F.col(c).cast("string"))]
        )
        if extras
        else empty
    )
    if meta_col in df.columns:
        existing = F.coalesce(F.col(meta_col).cast("map<string,string>"), empty)
        if extras:
            # typed columns win on collision; map_concat errors on dup keys
            # under the default EXCEPTION dedup policy, so drop them first
            existing = F.map_filter(
                existing, lambda k, _: ~k.isin(extras)
            )
        folded = F.map_concat(existing, folded)
    return df.withColumn(meta_col, folded).drop(*extras)


def collection_name_col(prefix: str, folder_col):
    """Column twin of StoreConfig.collection_name — the reference's
    collection-naming rule applied JVM-side at the sink
    (modules/config.py:37-43): lowercase, '-'/' ' -> '_', and the 'root'
    folder (or NULL) falls back to the '<prefix>_documents' default."""
    clean = F.translate(F.lower(folder_col), "- ", "__")
    # '' must hit the default too: StoreConfig.collection_name's
    # `if folder and folder != "root"` treats the empty string as falsy,
    # and the two twins must agree on where a row lands
    return F.when(
        folder_col.isNull() | (folder_col == "root") | (folder_col == ""),
        F.lit(f"{prefix}_documents"),
    ).otherwise(F.concat_ws("_", F.lit(prefix), clean))


# stats-manifest retention: versions beyond this many are pruned at commit
# (no time-travel value in count telemetry; the window is reader slack)
_STATS_KEEP_VERSIONS = 20


def checked_rename(fs, src, dst) -> None:
    """Hadoop ``FileSystem.rename`` reports failure by RETURNING FALSE, not
    by raising — an unchecked call can silently skip a swap step and leave
    the layout corrupted (e.g. staging renamed INSIDE a still-present dest).
    Raise instead, so a failed swap aborts loudly mid-discipline."""
    if not fs.rename(src, dst):
        raise IOError(f"rename failed: {src} -> {dst}")


def checked_delete(fs, path, recursive: bool = True) -> None:
    """delete() also returns False on failure (except when the path is
    already absent, which is fine for our aside-cleanup semantics)."""
    if fs.exists(path) and not fs.delete(path, recursive):
        raise IOError(f"delete failed: {path}")


class CollectionStore:
    def __init__(self, spark: SparkSession, config: StoreConfig | None = None):
        self.spark = spark
        self.config = config or StoreConfig()

    @property
    def _root(self) -> str:
        w = self.config.warehouse_dir
        return w if "://" in w or w.startswith("file:") else os.path.abspath(w)

    @property
    def _data_dir(self) -> str:
        return self._root + "/collections"

    # -- Hadoop FS plumbing (URI-scheme-agnostic DDL) ------------------------

    def _jpath(self, uri: str):
        return self.spark._jvm.org.apache.hadoop.fs.Path(uri)

    def _fs(self, uri: str):
        return self._jpath(uri).getFileSystem(
            self.spark._jsc.hadoopConfiguration()
        )

    # -- S9: DDL ------------------------------------------------------------

    def list_collections(self) -> list[str]:
        """Reference: milvus_store.py:370-372. One FS listing of the
        partition directories — no data read."""
        p = self._jpath(self._data_dir)
        fs = self._fs(self._data_dir)
        if not fs.exists(p):
            return []
        out = []
        for st in fs.listStatus(p):
            name = st.getPath().getName()
            if st.isDirectory() and name.startswith("collection="):
                out.append(name.split("=", 1)[1])
        return sorted(out)

    def collection_exists(self, name: str) -> bool:
        """Reference: milvus_store.py:68-70."""
        return name in self.list_collections()

    # work-directory naming shared by upsert/compaction swaps; order matters
    # for recovery (restore the freshest-semantics aside first)
    _ASIDE_PREFIXES = (".old-collection=", ".precompact-collection=")
    _WORK_PREFIXES = _ASIDE_PREFIXES + (
        ".upsert-collection=", ".compact-collection=",
    )

    def _warn_pre_rule_partitions(self, targets) -> None:
        """The naming rule (lowercase/sanitize, 'root'->default — reference
        modules/config.py:37-43) changed where some folders land relative
        to warehouses written before r11. If a partition exists whose name
        is a PRE-rule spelling of a target (sanitizes to it but differs
        literally, or the old literal '<prefix>_root'), new rows would
        silently split across the two spellings and upsert's key-dedup
        would not see the old rows — warn with the rename needed instead
        of letting that happen quietly. One FS listing, no data read."""
        existing = self.list_collections()
        if not existing:
            return

        def _sanitize(n: str) -> str:
            return n.lower().replace("-", "_").replace(" ", "_")

        default = f"{self.config.collection_prefix}_documents"
        old_root = f"{self.config.collection_prefix}_root"
        import warnings

        for t in set(targets):
            clashes = [
                e for e in existing if e != t and _sanitize(e) == t
            ]
            if t == default and old_root in existing:
                clashes.append(old_root)
            for e in clashes:
                warnings.warn(
                    f"collection {e!r} looks like a pre-naming-rule "
                    f"spelling of the target {t!r}: new rows go to {t!r} "
                    f"while the old rows stay in {e!r} (duplicate keys "
                    "across the pair are invisible to upsert's dedup). "
                    f"Rename the partition directory (collection={e} -> "
                    f"collection={t}) or drop_collection the stale one.",
                    stacklevel=3,
                )

    def _restore_if_crashed(self, fs, name: str) -> None:
        """Cross-mechanism crash recovery: if ANY aside (upsert's .old- or
        compaction's .precompact-) holds the only copy of a collection
        whose destination is absent, restore it — regardless of which
        operation crashed and which is retrying. Without this, an upsert
        after a crashed compaction would recreate the destination with
        delta-only rows and vacuum() would then delete the sole backup."""
        part = self._jpath(f"{self._data_dir}/collection={name}")
        for prefix in self._ASIDE_PREFIXES:
            aside = self._jpath(f"{self._data_dir}/{prefix}{name}")
            if fs.exists(aside) and not fs.exists(part):
                checked_rename(fs, aside, part)

    def drop_collection(self, name: str) -> None:
        """Reference: milvus_store.py:408-414. Partition-directory drop
        (recursive delete via the warehouse's own filesystem). Also removes
        any swap work directories for the name — a leftover aside would
        otherwise be 'restored' by the next upsert's crash recovery,
        resurrecting explicitly-dropped data."""
        fs = self._fs(self._data_dir)
        targets = [f"{self._data_dir}/collection={name}"] + [
            f"{self._data_dir}/{prefix}{name}" for prefix in self._WORK_PREFIXES
        ]
        for t in targets:
            checked_delete(fs, self._jpath(t))
        self._update_stats(
            lambda prev, n=name: (
                {k: v for k, v in prev.items() if k != n}
                if prev is not None
                else None
            )
        )

    def vacuum(self, grace_s: float = 900.0) -> list[str]:
        """Delete orphaned work directories (.upsert-/.old-/.compact-/
        .precompact-) left by upserts or compactions that crashed before
        cleanup. Safe because readers never see dot-prefixed children and
        every crash state that still NEEDS an aside (destination absent) is
        repaired by the recovery step at the start of the next
        upsert/compaction — anything remaining alongside a live destination
        is garbage by construction. Returns the deleted paths.

        ``grace_s``: work dirs modified within the last ``grace_s`` seconds
        are SKIPPED — a concurrent upsert/compaction that just wrote its
        staging dir and is about to rename it must not lose the batch to a
        racing vacuum. An orphan from a crash is by definition old, so the
        grace window costs nothing; pass ``grace_s=0`` only when no writer
        can be in flight."""
        fs = self._fs(self._data_dir)
        root = self._jpath(self._data_dir)
        if not fs.exists(root):
            return []
        removed = []
        now_ms = time.time() * 1000.0
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if not name.startswith(self._WORK_PREFIXES):
                continue
            if now_ms - st.getModificationTime() < grace_s * 1000.0:
                continue  # possibly in flight — leave for the next vacuum
            # the recovery precondition: an ASIDE may only be deleted when
            # its live destination exists (else it is the sole surviving
            # copy, left for recovery to restore); staging dirs are always
            # re-creatable
            if name.startswith(self._ASIDE_PREFIXES):
                live = "collection=" + name.split("=", 1)[1]
                if not fs.exists(self._jpath(f"{self._data_dir}/{live}")):
                    continue
            checked_delete(fs, st.getPath())
            removed.append(name)
        return removed

    def reset(self, confirm: bool = False) -> int:
        """S10 — drop everything (reference: main.py:243-277, --confirm gate)."""
        if not confirm:
            raise ValueError("reset requires confirm=True")
        n = len(self.list_collections())
        fs = self._fs(self._root)
        p = self._jpath(self._root)
        if fs.exists(p):
            fs.delete(p, True)
        return n

    # -- S8: sink -------------------------------------------------------------

    def insert_documents(
        self,
        chunks: DataFrame,
        split_by_folder: bool = True,
        folder_col: str = "folder_name",
        embed: bool = True,
        embedding_config: EmbeddingConfig | None = None,
        mode: str = "append",
        dynamic_meta: bool = False,
        count_rows: bool = True,
    ) -> dict[str, int]:
        """Embed + write, partitioned by collection.

        Reference (milvus_store.py:138-234) groups docs by folder in the
        driver and loops collections with batch-100 inserts; here grouping is
        the partitioned write itself (one distributed job, no driver loop)
        and batching is Arrow's. Returns per-collection counts of the rows
        INSERTED BY THIS CALL (the reference's Dict[str, int] semantics —
        milvus_store.py:176-234 accumulates per-batch inserted counts),
        computed from the incoming batch BEFORE the embedding stage: one
        UDF-free aggregation over the batch, never a post-write scan of
        the whole warehouse (which is O(total data) per insert at 100 TB).

        ``dynamic_meta=True`` is the reference's ``enable_dynamic_field``
        (milvus_store.py:62-66): columns outside DOCUMENT_FIXED_COLS fold
        into the ``meta: map<string,string>`` column (:func:
        `fold_dynamic_meta`) so heterogeneous loader batches share ONE
        stable parquet schema. Default off — this store also accepts any
        typed column as-is (a superset of Milvus's fixed schema), and
        callers relying on that keep their exact layout."""
        cfg = self.config
        if split_by_folder and folder_col in chunks.columns:
            # reference naming rule incl. lowercase/sanitize and the
            # 'root'-folder default (modules/config.py:37-43)
            collection = collection_name_col(
                cfg.collection_prefix, F.col(folder_col)
            )
        else:
            collection = F.lit(f"{cfg.collection_prefix}_documents")
        df = chunks.withColumn("collection", collection)
        if dynamic_meta:
            df = fold_dynamic_meta(df)
        # P7 varchar truncation at the sink (milvus_store.py:207-215)
        for name, col in truncate_cols(
            cfg.text_max_len, cfg.source_max_len, cfg.filename_max_len,
            cfg.language_max_len,
        ).items():
            if name in df.columns:
                df = df.withColumn(name, col)
        # the pre-write count re-executes the batch's lineage once (cheap
        # for parquet-backed batches, real for UDF-heavy ones) — callers
        # that discard the counts (e.g. the streaming sink, which writes
        # every micro-batch) pass count_rows=False and pay only the write
        counts = (
            {
                r["collection"]: r["count"]
                for r in df.groupBy("collection").count().collect()
            }
            if count_rows
            else {}
        )
        if counts:
            # the count job already materialized the target names —
            # reuse them to flag pre-naming-rule partition spellings
            self._warn_pre_rule_partitions(counts)
        if embed and "embedding" not in df.columns:
            df = with_embeddings(df, config=embedding_config)
        # seed decision BEFORE the write: a first insert into an empty
        # warehouse can seed the stats manifest even with no prior manifest
        fresh = not self._fs(self._data_dir).exists(self._jpath(self._data_dir))
        df.write.mode(mode).partitionBy("collection").parquet(self._data_dir)
        if not count_rows:
            # unknown delta (streaming fast path skips the count job):
            # mark the manifest stale rather than serving drifting numbers
            self._update_stats(lambda _prev: None)
        elif mode != "append":
            # overwrite = totals ASSUMES static partitionOverwriteMode
            # (the session default here): the whole table is replaced, so
            # the batch counts ARE the totals. Under
            # spark.sql.sources.partitionOverwriteMode=dynamic, untouched
            # collections survive on disk but would vanish from this
            # manifest — mark it invalid instead so stats fall back to the
            # (self-healing) scan path rather than serving wrong numbers
            # (ADVICE r12).
            dyn = (
                self.spark.conf.get(
                    "spark.sql.sources.partitionOverwriteMode", "static"
                ).lower()
                == "dynamic"
            )
            self._update_stats(
                lambda _prev, c=counts, d=dyn: (None if d else c)
            )
        else:
            self._update_stats(
                lambda prev, c=counts, f=fresh: (
                    {**prev, **{k: prev.get(k, 0) + v for k, v in c.items()}}
                    if prev is not None
                    else (c if f else None)
                )
            )
        return counts

    def upsert_documents(
        self,
        chunks: DataFrame,
        key_col: str = "chunk_id",
        split_by_folder: bool = True,
        folder_col: str = "folder_name",
        embed: bool = True,
        embedding_config: EmbeddingConfig | None = None,
        dynamic_meta: bool = False,
    ) -> dict[str, int]:
        """Incremental merge: new rows replace existing rows with the same
        ``key_col`` within their collection; unrelated collections are
        untouched. Parquet has no MERGE, so the affected collections are
        rewritten as (existing ANTI-JOIN new) ∪ new into a staging
        directory and swapped in rename-aside → rename-in → delete-aside,
        so the destination is never absent. On HDFS-like filesystems each
        rename is atomic, so a reader sees a complete old or complete new
        listing; on object stores (s3a) "rename" is a non-atomic
        copy+delete, so a concurrent reader can still observe a partial
        swap — use a table format (Iceberg/Delta) there for true snapshot
        isolation. Cost scales with the AFFECTED
        collections only (partition pruning on the read), not the
        warehouse; at 100 TB keep collections sized so a rewrite is an
        acceptable unit of work (this is the classic copy-on-write merge,
        the same trade Hive-style COW tables make).
        Returns per-affected-collection row counts."""
        cfg = self.config
        if split_by_folder and folder_col in chunks.columns:
            # reference naming rule incl. lowercase/sanitize and the
            # 'root'-folder default (modules/config.py:37-43)
            collection = collection_name_col(
                cfg.collection_prefix, F.col(folder_col)
            )
        else:
            collection = F.lit(f"{cfg.collection_prefix}_documents")
        incoming = chunks.withColumn("collection", collection)
        if dynamic_meta:
            incoming = fold_dynamic_meta(incoming)
        for name, col in truncate_cols(
            cfg.text_max_len, cfg.source_max_len, cfg.filename_max_len,
            cfg.language_max_len,
        ).items():
            if name in incoming.columns:
                incoming = incoming.withColumn(name, col)
        if embed and "embedding" not in incoming.columns:
            incoming = with_embeddings(incoming, config=embedding_config)

        affected = [
            r["collection"]
            for r in incoming.select("collection").distinct().collect()
        ]
        self._warn_pre_rule_partitions(affected)
        counts: dict[str, int] = {}
        fs = self._fs(self._data_dir)
        for name in affected:
            part_dir = f"{self._data_dir}/collection={name}"
            aside = f"{self._data_dir}/.old-collection={name}"
            # crash recovery BEFORE anything else: a previous upsert OR
            # compaction that died mid-swap left the only copy of the old
            # rows in an aside — restore it, or the merge below would treat
            # the collection as new and the aside cleanup would permanently
            # destroy the backup
            self._restore_if_crashed(fs, name)
            new_part = incoming.filter(F.col("collection") == name).drop(
                "collection"
            )
            if fs.exists(self._jpath(part_dir)):
                old = self.spark.read.parquet(part_dir)
                keep = old.join(
                    new_part.select(key_col), key_col, "left_anti"
                )
                merged = keep.unionByName(new_part, allowMissingColumns=True)
            else:
                merged = new_part
            staging = f"{self._data_dir}/.upsert-collection={name}"
            merged.write.mode("overwrite").parquet(staging)
            checked_delete(fs, self._jpath(aside))
            if fs.exists(self._jpath(part_dir)):
                checked_rename(fs, self._jpath(part_dir), self._jpath(aside))
            checked_rename(fs, self._jpath(staging), self._jpath(part_dir))
            checked_delete(fs, self._jpath(aside))
            counts[name] = self.spark.read.parquet(part_dir).count()
        # upsert counts are post-merge TOTALS for the affected collections —
        # overlay them; unaffected collections keep their manifest numbers
        self._update_stats(
            lambda prev, c=counts: {**prev, **c} if prev is not None else None
        )
        return counts

    # -- scans ---------------------------------------------------------------

    def read(
        self, collection: str | None = None, merge_schema: bool = False
    ) -> DataFrame:
        """Scan one collection (partition-pruned) or all (fan-out).

        ``merge_schema=True`` unions footers across files — needed ONLY
        when collections were written with heterogeneous columns (e.g. a
        warehouse mixing pre-`meta` and dynamic-meta batches: the default
        single-footer schema can silently hide the `meta` column). Off by
        default: footer union is an extra metadata pass that a
        consistently-written warehouse never needs, and at 100 TB file
        counts it is not free."""
        reader = self.spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        df = reader.parquet(self._data_dir)
        if collection is not None:
            df = df.filter(F.col("collection") == collection)
        return df

    def load_collection(self, collection: str | None = None) -> DataFrame:
        """X3 — memory residency ≅ cache() (milvus_store.py:72-76)."""
        return self.read(collection).cache()

    # -- SQL surface ----------------------------------------------------------

    def create_views(self, prefix: str = "") -> list[str]:
        """Register the warehouse for ``spark.sql``: one ``collections``
        view over the whole partitioned dataset (partition pruning applies
        when a query filters on the ``collection`` column) plus one view
        per collection. Returns the view names. This is the SQL face of
        the store — ``SELECT ... FROM html_docs WHERE language='korean'``
        gets the same pushdown/pruning as the DataFrame facade."""
        names = []
        self.read().createOrReplaceTempView(f"{prefix}collections")
        names.append(f"{prefix}collections")
        for n in self.list_collections():
            self.read(n).createOrReplaceTempView(f"{prefix}{n}")
            names.append(f"{prefix}{n}")
        return names

    # -- X1/X2: index lifecycle (milvus_store.py:110-136) ---------------------

    def _index_path(self, collection: str | None, kind: str) -> str:
        return f"{self._root}/indexes/{collection or '_all'}/{kind}"

    def build_index(
        self,
        collection: str | None = None,
        kind: str | None = None,
        **params,
    ):
        """Build the configured ANN index over one collection (or the whole
        warehouse): ``kind`` ∈ {'ivf', 'graph'} (defaults from
        ``StoreConfig.index_type`` — IVF_FLAT like the reference default,
        milvus_store.py:125-131; 'graph' is the HNSW-contract NSW shards).
        The index is itself parquet under ``<warehouse>/indexes/...`` — no
        local-filesystem side channel, same URI scheme as the data."""
        kind = kind or (
            "graph" if self.config.index_type.upper() == "HNSW" else "ivf"
        )
        df = self.read(collection)
        path = self._index_path(collection, kind)
        if kind == "ivf":
            from vectordb_etl_spark.operators.ann import IVFIndex

            params.setdefault("nlist", self.config.nlist)
            return IVFIndex(self.spark, path, metric=self.config.metric_type).build(
                df, **params
            )
        if kind == "graph":
            from vectordb_etl_spark.operators.graph_ann import GraphANNIndex

            passthrough = params.pop(
                "passthrough",
                [
                    c
                    for c in ("text", "language", "collection", "meta")
                    if c in df.columns
                ],
            )
            params.setdefault("ef_construction", self.config.ef_construction)
            # pass the store metric so a non-COSINE store fails here with
            # the tier's clear contract error, not with silently-wrong
            # cosine scores ranked under the store's metric
            return GraphANNIndex(
                self.spark, path, metric=self.config.metric_type
            ).build(
                df, id_col=params.pop("id_col", "chunk_id"),
                passthrough=passthrough, **params,
            )
        raise ValueError(f"unknown index kind {kind!r}")

    def fanout_search_indexed(
        self,
        query: list[float],
        k: int = 3,
        nprobe: int = 16,
        collections: list[str] | None = None,
        kind: str = "ivf",
        ef: int = 100,
        on_missing: str = "raise",
        fallback_id_col: str = "chunk_id",
        merge_schema: bool = False,
        **search_kwargs,
    ) -> DataFrame:
        """Q2 through PER-COLLECTION indexes (the exact Milvus fan-out
        shape, milvus_store.py:301-325: loop collections, search each
        index, concat + global sort): each named collection's previously
        built index is probed independently — IVF partitions prune per
        collection, graph shards beam per collection — results are
        tagged with the collection name, unioned, and one global
        TakeOrderedAndProject merges the ≤ |collections|·k candidate
        rows.

        ``on_missing`` governs collections without a built index:
        ``'raise'`` (default — an unexpected full scan hiding a 100×
        cost cliff should be an explicit user decision) or ``'exact'``,
        which serves the un-indexed collections by exact brute-force
        ``topk_search`` over their partition-pruned scans and unions
        them with the indexed probes — Milvus's own behavior, which
        searches every loaded collection regardless of index state
        (milvus_store.py:301-325 iterates collections uniformly). The
        exact tier scores with the same metric/rounding as the index
        tiers, so the merged order is consistent; for ``kind='graph'``
        the scan's ``fallback_id_col`` is surfaced as ``id`` (the graph
        index's id column) and ties follow the graph tier's rule
        (``output_cols`` ascending). Per-collection indexes beat one
        shared-layout index (IVFIndex.search_per_group) when collections
        are hot/cold skewed: each gets its own centroid budget and the
        probe cost is per-collection, not corpus-wide."""
        from vectordb_etl_spark.functions.vector import metric_ascending
        from vectordb_etl_spark.operators.topk import topk_search

        if on_missing not in ("raise", "exact"):
            raise ValueError(f"on_missing must be 'raise'|'exact'; got {on_missing!r}")
        names = collections if collections is not None else self.list_collections()
        if not names:
            raise ValueError("fanout_search_indexed: no collections to search")
        # tie_break drives BOTH the per-collection order and the global
        # merge for IVF; GraphANNIndex.search has no tie_break parameter
        # (it ties on output_cols ascending internally), so for the graph
        # kind it is consumed here and applied only at the merge
        tie_break = search_kwargs.pop("tie_break", None) or []
        parts = []
        for n in names:
            ipath = self._index_path(n, kind)
            if not self._fs(ipath).exists(self._jpath(ipath)):
                if on_missing == "raise":
                    raise ValueError(
                        f"collection {n!r} has no {kind} index — build_index "
                        "first (or pass on_missing='exact' to serve it by "
                        "brute-force scan, Milvus-style)"
                    )
                # merge_schema threads through to the exact fallback: on a
                # mixed pre-meta/dynamic-meta warehouse the single-footer
                # default could hide the `meta` column from a dynamic-field
                # predicate while the indexed tiers (which store their own
                # schema) resolve it fine
                scan = self.read(n, merge_schema=merge_schema).drop("collection")
                # graph-only beam knob: the exact fallback applies the
                # predicate exactly regardless of strategy
                fb_kwargs = {
                    k_: v for k_, v in search_kwargs.items()
                    if k_ != "filter_mode"
                }
                if kind == "graph":
                    # graph tier contract: COSINE-only (open_index raises
                    # for other metrics before any indexed probe merges)
                    if self.config.metric_type.upper() != "COSINE":
                        raise ValueError(
                            "graph index tier is COSINE-only; store metric "
                            f"is {self.config.metric_type!r}"
                        )
                    scan = scan.withColumnRenamed(fallback_id_col, "id")
                    # same non-orderable exclusion as the indexed path's
                    # merge (graph_ann._orderable_tiebreak): output_cols
                    # may carry the dynamic `meta` map, and an orderBy on
                    # a MapType is an AnalysisException
                    from pyspark.sql.types import MapType

                    fb_ties = [
                        c
                        for c in (fb_kwargs.get("output_cols") or ["id"])
                        if c not in scan.columns
                        or not isinstance(scan.schema[c].dataType, MapType)
                    ]
                else:
                    fb_ties = tie_break
                hits = topk_search(
                    scan, query, k=k, metric=self.config.metric_type,
                    tie_break=fb_ties, **fb_kwargs,
                )
            else:
                idx = self.open_index(n, kind=kind)
                if kind == "ivf":
                    hits = idx.search(
                        query, k=k, nprobe=nprobe, tie_break=tie_break,
                        **search_kwargs,
                    )
                else:
                    hits = idx.search(query, k=k, ef=ef, **search_kwargs)
            parts.append(hits.withColumn("collection", F.lit(n)))
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        score = search_kwargs.get("score_name", "score")
        # metric-aware direction (L2 is a distance — ascending), matching
        # topk_search/fanout_search; then the caller's within-collection
        # tie rule before the collection tag, so the global order matches
        # a single exact top-k over the union on score ties. The graph
        # tier is COSINE-only (open_index raises for any other store
        # metric before reaching this merge), so its scores always rank
        # descending.
        asc = kind == "ivf" and metric_ascending(self.config.metric_type)
        order = [F.asc(score) if asc else F.desc(score)]
        order += [F.asc(c) for c in tie_break]
        order.append(F.asc("collection"))
        return out.orderBy(*order).limit(k)

    def open_index(self, collection: str | None = None, kind: str = "ivf"):
        """Reopen a previously built index (artifact is self-describing)."""
        if kind == "ivf":
            from vectordb_etl_spark.operators.ann import IVFIndex

            return IVFIndex(
                self.spark, self._index_path(collection, kind),
                metric=self.config.metric_type,
            )
        if kind == "graph":
            from vectordb_etl_spark.operators.graph_ann import GraphANNIndex

            return GraphANNIndex(
                self.spark, self._index_path(collection, kind),
                metric=self.config.metric_type,
            )
        raise ValueError(f"unknown index kind {kind!r}")

    def index_rebalance_hints(
        self, collections: list[str] | None = None, ratio: float | None = None
    ) -> dict[str, dict]:
        """Segment-manager sweep (the Milvus compaction-trigger analog —
        milvus_store.py:232 flush/seal lifecycle): per collection that has
        a graph index, its ``rebalance_hint`` telemetry. A warehouse
        maintenance job filters on ``recommend_compact`` and runs
        ``open_index(name, 'graph').compact()`` on the flagged ones. Cost:
        one partition-column-only count per indexed collection."""
        names = (
            collections if collections is not None else self.list_collections()
        )
        out: dict[str, dict] = {}
        for n in names:
            ipath = self._index_path(n, "graph")
            if self._fs(ipath).exists(self._jpath(ipath)):
                # one existing-but-empty (or partially deleted) index dir
                # must not abort the whole warehouse sweep (ADVICE r12)
                try:
                    out[n] = self.open_index(n, kind="graph").rebalance_hint(
                        ratio=ratio
                    )
                except Exception as e:  # noqa: BLE001 — per-collection guard
                    out[n] = {"error": str(e)}
        return out

    # -- A11 stats manifest ----------------------------------------------------
    #
    # Milvus serves num_entities from segment METADATA, not a scan
    # (milvus_store.py:387-406 calls collection.num_entities). The parquet
    # twin of that is a tiny versioned count manifest under
    # ``<warehouse>/_stats/``, maintained transactionally by this store's
    # own mutating API (insert/upsert/drop) with the same rename-if-absent
    # optimistic commit as store/snapshots.py — so collection_stats is a
    # driver-side JSON read, ZERO Spark jobs, instead of a per-call scan
    # job over the partition column (which at 100 TB file counts is a real
    # listing+footer pass every time someone asks "how many rows").
    # Out-of-band writes (direct parquet into the data dir) are detected
    # by cross-checking the manifest's collection SET against the
    # partition listing; in-place row changes outside this API are not
    # detectable and such writers must call refresh via
    # collection_stats(use_manifest=False) (which self-heals the
    # manifest from its scan).

    @property
    def _stats_dir(self) -> str:
        return f"{self._root}/_stats"

    def _stats_versions(self, fs) -> list[int]:
        return manifest_versions(fs, self._jpath, self._stats_dir)

    def _read_stats(self, fs, version: int) -> dict:
        return read_manifest(
            self.spark, fs, self._jpath, self._stats_dir, version
        )

    def _try_commit_stats(self, fs, version: int, manifest: dict) -> bool:
        if not try_commit_manifest(
            fs, self._jpath, self._stats_dir, version, manifest
        ):
            return False
        # prune: unlike the snapshot log, old stats manifests carry no
        # time-travel value — without pruning an insert-heavy warehouse
        # accumulates one tiny file per mutation forever. Keep a window
        # (readers open the latest; 20 commits of slack covers any
        # reader that listed versions just before this commit)
        for v in self._stats_versions(fs)[:-_STATS_KEEP_VERSIONS]:
            fs.delete(self._jpath(f"{self._stats_dir}/{v}.json"), False)
        return True

    def _latest_stats_counts(self) -> dict[str, int] | None:
        """Counts from the newest manifest, or None when absent/invalid."""
        fs = self._fs(self._root)
        vs = self._stats_versions(fs)
        if not vs:
            return None
        try:
            m = self._read_stats(fs, vs[-1])
            return dict(m["collections"]) if m.get("valid", True) else None
        except Exception:  # noqa: BLE001 — a half-copied manifest (s3a
            # rename is a non-atomic copy) or hand-damaged JSON must
            # degrade to the scan path, never fail the stats call; the
            # scan's self-heal then commits a NEW version past the bad one
            return None

    def _update_stats(self, fn) -> None:
        """Optimistic commit loop: ``fn(prev_counts | None) -> counts |
        None`` rebased on the latest manifest each retry (a lost rename
        race re-applies the delta onto whatever won). ``None`` out marks
        the manifest invalid; best-effort — a stats failure must never
        fail the write that produced the rows."""
        try:
            fs = self._fs(self._root)
            # bounded retries (ADVICE r12): if rename persistently fails
            # for a NON-race reason (object-store/permission quirk), give
            # up rather than spin — the scan path self-heals later anyway
            for _attempt in range(5):
                vs = self._stats_versions(fs)
                prev = None
                if vs:
                    try:
                        m = self._read_stats(fs, vs[-1])
                        prev = (
                            dict(m["collections"])
                            if m.get("valid", True)
                            else None
                        )
                    except Exception:  # noqa: BLE001 — corrupt latest:
                        # rebase on nothing but STILL commit vs[-1]+1, so
                        # the bad file is superseded (it can never be
                        # rewritten in place — commits are rename-if-absent)
                        prev = None
                new = fn(prev)
                if new is None and prev is None:
                    return  # already invalid/absent — no marker churn
                version = (vs[-1] + 1) if vs else 0
                manifest = (
                    {"version": version, "valid": False}
                    if new is None
                    else {
                        "version": version,
                        "valid": True,
                        "collections": {k: int(v) for k, v in new.items()},
                    }
                )
                if self._try_commit_stats(fs, version, manifest):
                    return
            # retries exhausted with the delta NOT applied: a still-valid
            # latest manifest would serve stale counts forever — the
            # out-of-band check only compares the collection SET, which a
            # same-collection append never changes (ADVICE r13). Mark the
            # manifest invalid (best-effort) so readers fall back to the
            # self-healing scan path instead of undercounting.
            vs = self._stats_versions(fs)
            version = (vs[-1] + 1) if vs else 0
            self._try_commit_stats(fs, version, {"version": version, "valid": False})
        except Exception:  # noqa: BLE001 — telemetry only, never fail a write
            pass

    def collection_stats(
        self, collection: str | None = None, use_manifest: bool = True
    ) -> dict[str, int]:
        """Row counts per collection (milvus_store.py:374-406 — Milvus
        reads collection.num_entities, segment metadata, not a scan).
        Served from the ``_stats`` manifest when it is valid AND its
        collection set matches the partition listing (one FS listing, zero
        Spark jobs); otherwise one partition-column aggregation scan,
        whose result self-heals the manifest for the next call. Pass
        ``use_manifest=False`` to force the scan (and re-seed the
        manifest) after out-of-band writes."""
        if use_manifest:
            counts = self._latest_stats_counts()
            if counts is not None and set(counts) == set(
                self.list_collections()
            ):
                if collection is not None:
                    return (
                        {collection: counts[collection]}
                        if collection in counts
                        else {}
                    )
                return counts
        if collection is not None:
            # partition-pruned scan; a single-collection ask must never
            # pay a warehouse-wide pass, so no full re-seed here
            rows = self.read(collection).groupBy("collection").count().collect()
            return {r["collection"]: r["count"] for r in rows}
        rows = self.read(None).groupBy("collection").count().collect()
        counts = {r["collection"]: r["count"] for r in rows}
        self._update_stats(lambda _prev: counts)  # self-heal for next call
        return counts

    def dynamic_field_stats(
        self, collection: str | None = None, meta_col: str = "meta"
    ) -> DataFrame:
        """Introspect the dynamic schema: per dynamic-field key, how many
        rows carry it and how many distinct values it takes — what a
        Milvus enable_dynamic_field user asks before filtering on $meta
        keys (there is no declared schema to consult). One
        explode-and-aggregate over the (pruned) scan; returns a DataFrame
        so it composes (collect at the caller's edge)."""
        df = self.read(collection)
        if meta_col not in df.columns:
            return self.spark.createDataFrame(
                [], "key string, n_rows long, n_values long"
            )
        return (
            df.select(F.explode(meta_col).alias("key", "value"))
            .groupBy("key")
            .agg(
                F.count("*").alias("n_rows"),
                F.count_distinct("value").alias("n_values"),
            )
            .orderBy("key")
        )
