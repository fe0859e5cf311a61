"""Top-k similarity search — operators Q1/Q2/Q3 (SURVEY.md §2.5).

Exact tier: score every (filtered) vector against a literal query vector and
take the global top-k. The Catalyst plan is the one you want at 100 TB:

    parquet scan (language/collection predicates pushed down, columns pruned)
      → whole-stage-codegen projection computing the score (zip_with/aggregate)
        → TakeOrderedAndProject (per-partition heap top-k, then driver merge
          of k·num_partitions rows — no global sort, no shuffle)

The query vector is a plan literal (broadcast with the task binaries). The
approximate tier (IVF partition pruning) is in operators/ann.py.

Determinism: ties on score are broken by ``tie_break`` columns so the same
k rows are selected on any partitioning (and by the DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from vectordb_etl_spark.functions.vector import metric_ascending, score_col


def topk_search(
    df: DataFrame,
    query: list[float],
    k: int = 3,
    metric: str = "COSINE",
    predicate: Column | None = None,
    emb_col: str = "embedding",
    score_name: str = "score",
    tie_break: list[str] | None = None,
    output_cols: list[str] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Q1 — exact top-k vector search with optional scalar predicate
    (reference: modules/milvus_store.py:254-299; filter composition at 295).

    ``round_dp`` rounds the score so ordering/selection is reproducible
    across engines and partitionings.
    """
    if predicate is not None:
        df = df.filter(predicate)
    scored = df.withColumn(
        score_name, F.round(score_col(emb_col, query, metric), round_dp)
    )
    order = [
        F.col(score_name).asc() if metric_ascending(metric) else F.col(score_name).desc()
    ]
    for c in tie_break or []:
        order.append(F.col(c).asc())
    out = scored.orderBy(*order).limit(k)
    if output_cols is not None:
        out = out.select(*output_cols, score_name)
    return out


def fanout_search(
    df: DataFrame,
    query: list[float],
    k: int = 3,
    metric: str = "COSINE",
    predicate: Column | None = None,
    collection_col: str = "collection",
    **kwargs,
) -> DataFrame:
    """Q2 — multi-collection fan-out + global merge
    (reference: modules/milvus_store.py:301-325).

    The reference loops collections, re-embeds the query per collection and
    concat-sorts in the driver. With one collection-partitioned table the
    fan-out is simply the same scan WITHOUT the collection filter: one job,
    one TakeOrderedAndProject, query embedded once. The result keeps the
    ``collection`` tag column (milvus_store.py:319-320). Sort direction is
    metric-aware (fixes the desc-only assumption at milvus_store.py:324)."""
    return topk_search(
        df, query, k=k, metric=metric, predicate=predicate, **kwargs
    )


def search_per_group_topk(
    df: DataFrame,
    query: list[float],
    k: int = 3,
    metric: str = "COSINE",
    group_col: str = "collection",
    emb_col: str = "embedding",
    score_name: str = "score",
    tie_break: list[str] | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Top-k *within each* group (per-collection hit lists before the global
    merge — what the reference's per-collection loop produces at
    milvus_store.py:314-317). Window rank per group; one shuffle on the
    group key."""
    from pyspark.sql.window import Window

    scored = df.withColumn(
        score_name, F.round(score_col(emb_col, query, metric), round_dp)
    )
    order = [
        F.col(score_name).asc() if metric_ascending(metric) else F.col(score_name).desc()
    ]
    for c in tie_break or []:
        order.append(F.col(c).asc())
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        scored.withColumn("__rank", F.row_number().over(w))
        .filter(F.col("__rank") <= k)
        .drop("__rank")
    )


def hybrid_rrf_search(
    df: DataFrame,
    query_terms: list[str],
    query_vec: list[float],
    k: int = 10,
    rrf_k: int = 60,
    text_col: str = "text",
    emb_col: str = "embedding",
    id_col: str = "doc_id",
    output_cols: list[str] | None = None,
) -> DataFrame:
    """Hybrid retrieval — keyword rank ⊕ vector rank fused with Reciprocal
    Rank Fusion: rrf = Σ 1/(rrf_k + rank_i). The standard fusion for
    vector databases that serve both lexical and semantic recall (RRF is
    rank-only, so the two score scales never need calibration).

    Shapes: both scores are one codegen projection over the same scan
    (term hits via regexp_count on word boundaries; cosine as the usual
    fold); the two ranks share ONE global sort each (window over an empty
    partition — acceptable for ranking a FILTERED candidate pool; at
    100 TB run it after a predicate/ANN cut, not over the raw corpus, or
    swap rank() for a per-partition approximation). Final top-k is
    TakeOrderedAndProject. Deterministic ties: (score, id) ordering on
    both ranks and (rrf, id) on the fusion."""
    from pyspark.sql.window import Window

    kw = sum(
        (F.regexp_count(F.lower(F.col(text_col)), F.lit(r"\b" + t.lower() + r"\b"))
         for t in query_terms),
        F.lit(0),
    )
    scored = df.withColumn("kw_score", kw).withColumn(
        "vec_score", F.round(score_col(emb_col, query_vec, "COSINE"), 6)
    )
    w_kw = Window.orderBy(F.desc("kw_score"), F.asc(id_col))
    w_vec = Window.orderBy(F.desc("vec_score"), F.asc(id_col))
    fused = scored.withColumn("kw_rank", F.row_number().over(w_kw)).withColumn(
        "vec_rank", F.row_number().over(w_vec)
    ).withColumn(
        "rrf",
        F.round(
            1.0 / (F.lit(rrf_k) + F.col("kw_rank"))
            + 1.0 / (F.lit(rrf_k) + F.col("vec_rank")),
            8,
        ),
    )
    out_cols = output_cols or [id_col]
    return (
        fused.orderBy(F.desc("rrf"), F.asc(id_col))
        .limit(k)
        .select(*out_cols, "kw_rank", "vec_rank", "rrf")
    )
