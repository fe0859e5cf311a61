"""Collection store: partitioned-parquet warehouse replacing Milvus, plus
physical-layout tools (bucketed co-located joins, compaction, clustering,
zone-map manifests) and the snapshot log (versioned tables)."""

from vectordb_etl_spark.store.collections import CollectionStore
from vectordb_etl_spark.store.layout import (
    compact_collection,
    file_stats_manifest,
    prune_candidate_files,
    write_bucketed,
    write_clustered,
    write_zordered,
    zorder_exact_layout,
    zorder_key_exact_col,
    zorder_key_exact_sql,
)
from vectordb_etl_spark.store.snapshots import SnapshotStore

__all__ = [
    "CollectionStore",
    "SnapshotStore",
    "compact_collection",
    "file_stats_manifest",
    "prune_candidate_files",
    "write_bucketed",
    "write_clustered",
    "write_zordered",
    "zorder_exact_layout",
    "zorder_key_exact_col",
    "zorder_key_exact_sql",
]
