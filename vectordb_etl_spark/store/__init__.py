"""Collection store: partitioned-parquet warehouse replacing Milvus, plus
physical-layout tools (bucketed co-located joins, compaction)."""

from vectordb_etl_spark.store.collections import CollectionStore
from vectordb_etl_spark.store.layout import (
    compact_collection,
    write_bucketed,
    write_clustered,
)

__all__ = [
    "CollectionStore",
    "compact_collection",
    "write_bucketed",
    "write_clustered",
]
