"""Regenerate PLANS.md — formatted physical plans of the headline queries.

The scale story lives in the plans: pushed filters, pruned columns,
broadcast vs shuffle joins, TakeOrderedAndProject top-k, single-Window
batteries, Expand-based grouping sets, salted shuffle keys. This dumps
``explain(formatted)`` for a representative slice so reviewers can read
the actual shapes without running Spark. Usage:

    python tools/dump_plans.py [sf_dir]   # default /root/testdata/sf0.001
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HEADLINERS: list[tuple[str, str]] = [
    ("vector_topk",
     "Q1 exact search: filter+scan feeds a codegen score projection; the "
     "top-k is TakeOrderedAndProject (per-partition heaps, no global sort); "
     "the query vector is a plan literal."),
    ("vector_topk_filtered",
     "Same with a scalar predicate — note PushedFilters on the parquet scan."),
    ("shipping_priority",
     "TPC-H Q3 shape: broadcast dim, fact-fact shuffle join, partial+final "
     "aggregate, TakeOrderedAndProject."),
    ("returned_orders",
     "EXISTS decorrelated to LeftSemi — match multiplicity never "
     "materializes."),
    ("embedding_topk_pairs",
     "Exact pair search as block-matmul: explode to block-pair groups, one "
     "shuffle, FlatMapGroupsInPandas BLAS kernel, TakeOrderedAndProject "
     "merge. No BroadcastNestedLoopJoin."),
    ("minhash_lsh_candidates",
     "Signature fold is map-side; repartition on band_key makes the "
     "self-join reuse ONE exchange (ReusedExchange)."),
    ("simhash_near_dups",
     "Interleaved pigeonhole blocks; popcount-XOR Hamming before distinct."),
    ("asof_join_events_orders",
     "As-of join via union + one window — a single shuffle co-locates both "
     "sides; no inequality join."),
    ("events_cube",
     "CUBE via one Expand + one aggregate — not one scan per grouping set."),
    ("user_event_windows",
     "Four window functions, one Window node, one Exchange."),
    ("salted_join_enrichment",
     "Salted fact⋈dim: shuffle key is (user_id, __salt) — hot keys spread "
     "across num_salts reducers; dim exploded map-side."),
    ("events_sessionize",
     "Lag + running-sum sessionization: both windows share one "
     "(user_id)-partitioned sort."),
    ("fuzzy_prefix_pairs",
     "Edit-distance join via Pass-Join segment blocking: probe variants "
     "explode as tiny structs, keys derive post-explode (codegen-friendly), "
     "equi-join on (bucket, slot, segment), exact levenshtein filter inside "
     "— no cartesian."),
    ("hybrid_rrf_search",
     "Hybrid retrieval: keyword + vector scores in one projection, two "
     "row_number ranks, RRF fusion, TakeOrderedAndProject."),
    ("filter_expr_search",
     "Milvus filter-STRING facade: the parsed predicate pushes into the "
     "parquet scan (PushedFilters) exactly like a native Column filter."),
    ("disjunctive_predicate_revenue",
     "Q19 shape: OR-of-ANDs across join sides — Catalyst derives the "
     "per-side implied filters and pushes them below the broadcast join."),
    ("bilateral_shipping_volume",
     "Q7 five-table snowflake: nation broadcast twice under two aliases; "
     "the only big shuffle is lineitem⋈orders on orderkey."),
    ("large_order_customers",
     "Q18 shape: partial+final HAVING aggregate runs BEFORE the joins; "
     "only qualifying orderkeys flow into them."),
    ("event_type_pivot",
     "PIVOT with enumerated values: one partial+final aggregate of "
     "conditional counts — no per-value scan, no extra shuffle."),
    ("top_terms_per_language",
     "Grouped top-k: explode stays map-side of the (lang, term) partial "
     "agg; rank windows over the aggregated set only."),
    ("sequence_packing",
     "Greedy token-budget packing: ONE shuffle on the portable md5 bucket "
     "key, then FlatMapGroupsInPandas runs the sequential fold per bucket "
     "— parallelism scales with buckets, no global ordering."),
    ("ivf_topk_batch",
     "Batched ANN serving: broadcast (query_id, centroid_id) probe table "
     "prunes the scan once for N queries; per-query rank in one Window."),
    ("boilerplate_fraction",
     "Cross-doc repeated-template screen: explode -> map-side partial "
     "shingle counts -> one equi-join back on the shingle key -> per-doc "
     "aggregate. No cross product; hot shingles are partition imbalance, "
     "never a blowup."),
    ("weighted_sample",
     "Efraimidis-Spirakis weighted sampling: the -ln(u)/w priority is a "
     "pure codegen projection; per-stratum top-k is one Window exchange."),
    ("tfidf_top_terms",
     "TF-IDF keywords: map-side partial term counts, df from per-doc "
     "distinct terms, N broadcast as a 1-row aggregate, one Window for the "
     "per-doc top-k."),
    ("length_outlier_screen",
     "Percentile band filter: one aggregate computes both thresholds, the "
     "1-row bounds broadcast into the filter — no driver collect."),
    ("chunk_metadata",
     "C5/C6 metadata over SQL-expressible slices: transform+posexplode are "
     "map-side; the only exchange is the dedup window's hash partition."),
    ("ivf_sq8_topk",
     "IVF_SQ8: partition-pruned scan of int8 codes, dequantize as a "
     "codegen projection above the scan, TakeOrderedAndProject top-k."),
    ("substring_dup_stats",
     "Exact substring-window dedup: generate+explode windows map-side; "
     "every exchange is keyed by the uniform md5(window) hash or doc id "
     "— window text never shuffles."),
    ("semantic_dedup",
     "SemDeDup: one-pass vectorized centroid assignment (Arrow argmax UDF "
     "+ broadcast index-to-cid map — no n*k row explosion), then "
     "FlatMapGroupsInPandas BLAS pairing per cluster emitting decorated "
     "rows directly; 2 exchanges total."),
    ("bigram_logprob",
     "Corpus bigram LM scoring: tokens/bigrams from one split+slice "
     "transform (no position self-join); count aggregates are map-side "
     "partial; V broadcast as a 1-row aggregate."),
    ("dsir_log_weights",
     "DSIR importance weights: both bucket models are <=256-row broadcast "
     "joins onto the token stream — nothing shuffles on the token key."),
    ("pq_topk",
     "PQ ADC serving: broadcast codebook encode with a min-of-struct "
     "argmin aggregate (one exchange), broadcast LUT join, map-side "
     "partial score sum, TakeOrderedAndProject."),
    ("retention_cohorts",
     "Retention matrix: user-keyed first-touch agg, co-partitioned join "
     "back, distinct collapses user-cells before the matrix count."),
    ("market_share",
     "Q8 shape: seven-table join with dims broadcast; the per-year "
     "market-share ratio is ONE conditional aggregate pass."),
    ("suppliers_kept_waiting",
     "Q21 shape: EXISTS and NOT EXISTS decorrelated to one LeftSemi and "
     "one LeftAnti on (orderkey, <>suppkey) — correlated subqueries never "
     "re-execute."),
    ("customer_order_distribution",
     "Q13 shape: double aggregate over an OUTER join — the zero-order "
     "bucket survives both aggregation passes."),
    ("integrity_report",
     "Relational validation: 11 checks (orphan-FK left-anti counts, "
     "PK-uniqueness having-aggregates) as one lazy unioned plan."),
    ("ivf_pq_topk",
     "IVF_PQ serving: partition-pruned scan of smallint PQ codes, "
     "codebook reconstruction above the scan (literal expression at test "
     "dims, Arrow gather UDF at prod dims), TakeOrderedAndProject."),
    ("ivf_pq_residual_topk",
     "IVF_PQ with residual encoding (FAISS proper): reconstruction adds "
     "the broadcast-joined centroid back onto the codeword concat; "
     "pruning still reaches the scan under the join."),
    ("forecast_revenue_change",
     "Q6 shape: the pushdown proof — whole predicate battery in "
     "PushedFilters, 4-of-11-column ReadSchema, one map-side-combined "
     "global aggregate."),
    ("min_cost_supplier_per_part",
     "Q2 shape: correlated scalar-min decorrelated to aggregate -> "
     "min-per-part first-row window; part joins broadcast above."),
    ("supplier_part_counts",
     "Q16 shape: broadcast LEFT ANTI blocklist before the distinct-count "
     "aggregate — NOT IN never re-executes per row."),
    ("domain_cap_sample",
     "Per-domain caps: broadcast anti-join passes under-cap domains "
     "through unshuffled; only over-cap domains enter the window sort."),
    ("ngram_novelty",
     "Corpus redundancy curve: shingles explode keyed by md5(gram), "
     "min-per-hash map-side combine, hash-keyed decoration join — gram "
     "text never shuffles."),
    ("quality_classifier_scores",
     "fastText-style classifier serving: token explode (no Python), "
     "broadcast weight join, one doc-key sum — same cost as counting "
     "tokens."),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import __spark_entry__ as entrymod
    from vectordb_etl_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()

    out = [
        "# PLANS — headline physical plans (generated by tools/dump_plans.py)",
        "",
        f"Source: `explain(formatted)` at `{sf_dir}`. Regenerate with "
        "`python tools/dump_plans.py` after plan-affecting changes; "
        "tests/test_plans.py asserts the load-bearing shapes, this file is "
        "the human-readable record.",
        "",
    ]
    import re

    def _clip(text: str, width: int = 240) -> str:
        # collapse embedded literal vectors (64 doubles per query literal)
        # so the plan SHAPE stays readable
        text = re.sub(r"\[(-?\d+\.\d+(E-?\d+)?,){8,}[^\]]*\]", "[<vector literal>]", text)
        return "\n".join(
            ln if len(ln) <= width else ln[:width] + " …" for ln in text.splitlines()
        )

    for name, why in HEADLINERS:
        df = qs[name](spark, sf_dir)
        plan = _clip(
            df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        )
        out.append(f"## {name}")
        out.append("")
        out.append(why)
        out.append("")
        out.append("```")
        out.append(plan.rstrip())
        out.append("```")
        out.append("")
    Path("PLANS.md").write_text("\n".join(out))
    print(f"wrote PLANS.md ({len(HEADLINERS)} plans)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
