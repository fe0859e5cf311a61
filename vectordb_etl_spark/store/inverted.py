"""Inverted term index — partition-pruned postings for keyword lookups.

Beyond-reference tier: the reference serves keyword search by scanning
text per query (search.py LIKE filters); at 100 TB a selective term
lookup must touch a sliver of the corpus instead. Same design as the
IVF index's layout (operators/ann.py): the index IS a partitioned
parquet table, and the accelerating structure is the partition key —
postings live under ``term_bucket = md5-bucket(term)``, so a term
lookup reads exactly ONE partition directory (plan-assertable
``PartitionFilters``), then an id semi-join fetches the documents.

Build cost: one tokenize+explode+distinct pass, one shuffle on the
bucket key. Lookup cost: one pruned postings scan (corpus/n_buckets)
+ one semi join keyed on the doc id. Postings are (term, id) rows, not
arrays — append/merge friendly (a new batch's postings union in; same
segment thinking as the ANN tiers).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _bucket_col(term, n_buckets: int):
    t = F.col(term) if isinstance(term, str) else term
    return (
        F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long") % n_buckets
    ).cast("int")


def tokenize_col(text_col) -> F.Column:
    """The index's tokenization: lowercase, split on whitespace, drop
    empties — ONE definition shared by build and any oracle twin."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.array_remove(F.split(F.lower(c), r"\s+"), "")


class InvertedIndex:
    def __init__(self, spark: SparkSession, path: str, n_buckets: int = 64):
        self.spark = spark
        self.path = path.rstrip("/")
        self.n_buckets = n_buckets

    def build(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "InvertedIndex":
        postings = (
            docs.select(
                F.col(id_col).alias("id"),
                F.explode(tokenize_col(text_col)).alias("term"),
            )
            .distinct()
            .withColumn("term_bucket", _bucket_col("term", self.n_buckets))
        )
        (
            postings.repartition("term_bucket")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(f"{self.path}/postings")
        )
        return self

    def postings(self, term: str) -> DataFrame:
        """Doc ids containing ``term`` — reads one pruned partition."""
        lowered = term.lower()
        bucket = self._bucket_of(lowered)
        return (
            self.spark.read.parquet(f"{self.path}/postings")
            .filter(F.col("term_bucket") == bucket)
            .filter(F.col("term") == lowered)
            .select("id")
        )

    def lookup(
        self,
        docs: DataFrame,
        term: str,
        id_col: str = "doc_id",
    ) -> DataFrame:
        """Documents containing ``term`` via the index: pruned postings
        scan + id semi join — the full-scan-free keyword path."""
        ids = self.postings(term)
        return docs.join(
            ids, docs[id_col] == ids["id"], "left_semi"
        )

    def add(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "InvertedIndex":
        """Append a batch's postings (same segment model as the ANN
        tiers: new files land in the same bucket partitions; readers see
        them at the next listing; duplicate (term, id) pairs from
        re-indexed docs are tolerated — the semi join dedups)."""
        postings = (
            docs.select(
                F.col(id_col).alias("id"),
                F.explode(tokenize_col(text_col)).alias("term"),
            )
            .distinct()
            .withColumn("term_bucket", _bucket_col("term", self.n_buckets))
        )
        (
            postings.repartition("term_bucket")
            .write.mode("append")
            .partitionBy("term_bucket")
            .parquet(f"{self.path}/postings")
        )
        return self

    def _bucket_of(self, term: str) -> int:
        import hashlib

        return int(hashlib.md5(term.encode()).hexdigest()[:8], 16) % (
            self.n_buckets
        )
