"""Collection store: partitioned-parquet warehouse replacing Milvus."""

from vectordb_etl_spark.store.collections import CollectionStore

__all__ = ["CollectionStore"]
