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

    # -- ranked (BM25) tier ------------------------------------------------

    def build_ranked(
        self,
        docs: DataFrame,
        id_col: str = "doc_id",
        text_col: str = "text",
    ) -> "InvertedIndex":
        """Ranked-index build: term-FREQUENCY postings ``(id, term, tf)``
        under the same md5 ``term_bucket`` partitioning, plus a
        ``doclens`` table ``(id, dl)`` — everything BM25 scoring needs,
        one tokenize pass each. The reference has no lexical ranking at
        all (search.py substring filters, search_utils.py:31-73 vector
        hits only); this is the lexical arm a hybrid corpus store needs
        at 100 TB, where per-query text scans are off the table."""
        toks = docs.select(
            F.col(id_col).alias("id"), tokenize_col(text_col).alias("__ts")
        )
        postings = (
            toks.select("id", F.explode("__ts").alias("term"))
            .groupBy("id", "term")
            .agg(F.count("*").cast("bigint").alias("tf"))
            .withColumn("term_bucket", _bucket_col("term", self.n_buckets))
        )
        (
            postings.repartition("term_bucket")
            .write.mode("overwrite")
            .partitionBy("term_bucket")
            .parquet(f"{self.path}/ranked_postings")
        )
        toks.select(
            "id", F.size("__ts").cast("bigint").alias("dl")
        ).write.mode("overwrite").parquet(f"{self.path}/doclens")
        return self

    def bm25_topk(self, query: str, k: int = 10) -> DataFrame:
        """Top-``k`` docs for ``query`` by integer-exact BM25
        (k1 = 6/5, b = 3/4): reads ONLY the query terms' pruned postings
        partitions (≈ corpus·|terms|/n_buckets), joins doc lengths, and
        scores entirely in bigint arithmetic so the result hash-checks
        across engines. Returns ``(id, score_micro)``, score desc / id
        asc, ties broken deterministically.

        The scoring is the rational-idf BM25 variant: with A = avgdl
        computed as ``L DIV N`` (integer) the tf part
        ``tf·(k1+1) / (tf + k1·(1−b+b·dl/A))`` multiplies out to the
        exact integer ``(10⁶·44·A·tf) DIV (20·A·tf + 6·A + 18·dl)``,
        and the idf drops the (cross-engine ulp-unstable) ``ln`` for its
        monotone argument ``(2(N−df)+1)/(2df+1)`` — per-term ranking is
        identical to Robertson idf; multi-term sums weight rare terms
        more strongly (documented variant, ATIRE-style). Bounds: exact
        in bigint for corpora up to ~10¹¹ docs (contribution numerator
        ≤ 2.2·10⁶ · 2N).
        """
        terms = sorted(
            {t for t in query.lower().split() if t}
        )  # tokenize_col's rule, driver-side
        if not terms:
            raise ValueError("empty query")
        buckets = sorted({self._bucket_of(t) for t in terms})
        post = (
            self.spark.read.parquet(f"{self.path}/ranked_postings")
            .filter(F.col("term_bucket").isin(buckets))
            .filter(F.col("term").isin(terms))
            .select("id", "term", "tf")
        )
        dls = self.spark.read.parquet(f"{self.path}/doclens")
        stats = dls.agg(
            F.count("*").cast("bigint").alias("n"),
            F.expr("CAST(sum(dl) AS BIGINT) DIV count(*)").alias("a"),
        )
        dfs = post.groupBy("term").agg(F.count("*").cast("bigint").alias("df"))
        contrib = (
            post.join(F.broadcast(dfs), "term")
            .join(dls, "id")
            .crossJoin(F.broadcast(stats))
            .withColumn(
                "c",
                F.expr(
                    "((1000000 * 44 * a * tf) DIV (20*a*tf + 6*a + 18*dl))"
                    " * (2*(n - df) + 1) DIV (2*df + 1)"
                ),
            )
        )
        return (
            contrib.groupBy("id")
            .agg(F.sum("c").cast("bigint").alias("score_micro"))
            .orderBy(F.desc("score_micro"), F.asc("id"))
            .limit(k)
        )


def bm25_topk_sql(
    source_sql: str,
    terms: list[str],
    k: int = 10,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> str:
    """DuckDB twin of :meth:`InvertedIndex.bm25_topk` — the identical
    integer formula stated directly over the corpus (no index): same
    tokenization, tf/df/dl/avgdl from one unnest, same bigint
    arithmetic, same tie-break."""
    in_list = ", ".join("'%s'" % t.replace("'", "''") for t in sorted(set(terms)))
    return f"""
WITH bm_toks AS (
  SELECT {id_col} AS id,
         list_filter(string_split_regex(lower({text_col}), '\\s+'),
                     x -> x <> '') AS ts
  FROM ({source_sql})),
bm_dl AS (SELECT id, CAST(len(ts) AS BIGINT) AS dl FROM bm_toks),
bm_stats AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(dl) AS BIGINT) // CAST(count(*) AS BIGINT) AS a
  FROM bm_dl),
bm_tf AS (
  SELECT id, term, CAST(count(*) AS BIGINT) AS tf
  FROM (SELECT id, unnest(ts) AS term FROM bm_toks)
  WHERE term IN ({in_list}) GROUP BY 1, 2),
bm_df AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM bm_tf GROUP BY 1),
bm_c AS (
  SELECT id,
         ((1000000 * 44 * a * tf) // (20*a*tf + 6*a + 18*dl))
           * (2*(n - df) + 1) // (2*df + 1) AS c
  FROM bm_tf JOIN bm_df USING (term) JOIN bm_dl USING (id)
  CROSS JOIN bm_stats)
SELECT id, CAST(sum(c) AS BIGINT) AS score_micro
FROM bm_c GROUP BY id
ORDER BY score_micro DESC, id ASC LIMIT {k}"""
