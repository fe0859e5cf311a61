"""End-to-end LLM training-data prep over a documents table — the
composition this engine exists for, runnable at any scale:

    screen → boilerplate filter → transitive near-dup dedup → quality
    gate → domain mixing → weighted selection → sequence packing →
    pack-aligned shard files

Every stage is a declarative DataFrame op from the package (no driver
loops); the pipeline is ONE lazy plan until the shard write. Run:

    python examples/training_data_prep.py [sf_dir] [out_dir]

defaults: /root/testdata/sf0.001, a temp dir. Prints one JSON line per
stage with surviving row counts, then writes the shards.
"""

from __future__ import annotations

import json
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pyspark.sql import functions as F  # noqa: E402


def prepare_training_data(
    spark,
    docs,
    *,
    length_band=(0.02, 0.98),
    boilerplate_max_frac=0.8,
    substring_dup_max_frac=None,
    quality_gate=True,
    domain_cap=None,
    domain_col="source",
    dsir_target_lang=None,
    dsir_keep_frac=0.5,
    mix_targets=None,
    budget_tokens=200_000,
    pack_budget=512,
    select_k=None,
):
    """The composed prep pipeline; returns (packed DataFrame, stage dict).

    Stage order is cost-ordered: cheap column-expression screens first so
    the similarity passes (the only shuffle-heavy stages) see the smallest
    possible input."""
    from vectordb_etl_spark.functions import curation
    from vectordb_etl_spark.functions.text import (
        estimate_tokens_col,
        gopher_pass_col,
        gopher_signal_cols,
    )
    from vectordb_etl_spark.operators import dedup as D

    stages = {}
    keep_cols = ["doc_id", "lang", "text"]
    if domain_cap is not None and domain_col in docs.columns:
        keep_cols.append(domain_col)
    docs = docs.select(*keep_cols)
    stages["input"] = docs.count()

    # 1. length-outlier screen (percentile band of raw length)
    docs = curation.percentile_screen(
        docs.withColumn("__len", F.length("text")), "__len", *length_band
    ).drop("__len")
    stages["length_screened"] = docs.count()

    # 2. cross-doc boilerplate fraction gate
    frac = D.boilerplate_fraction(docs, id_col="doc_id").select(
        "doc_id", "boiler_frac"
    )
    docs = (
        docs.join(frac, "doc_id", "left")
        .filter(
            F.col("boiler_frac").isNull()
            | (F.col("boiler_frac") <= boilerplate_max_frac)
        )
        .drop("boiler_frac")
    )
    stages["boilerplate_screened"] = docs.count()

    # 2b. exact substring-window dup gate (the Lee-et-al. cut)
    if substring_dup_max_frac is not None:
        sd = D.substring_dup_stats(docs, id_col="doc_id").select(
            "doc_id", "dup_fraction"
        )
        docs = (
            docs.join(sd, "doc_id", "left")
            .filter(
                F.col("dup_fraction").isNull()
                | (F.col("dup_fraction") <= substring_dup_max_frac)
            )
            .drop("dup_fraction")
        )
        stages["substring_screened"] = docs.count()

    # 2c. optional per-domain document cap (RefinedWeb-style source
    # balancing) — BEFORE the similarity passes so over-represented domains
    # don't dominate the shuffle-heavy stages either
    if domain_cap is not None and domain_col in docs.columns:
        docs = curation.domain_cap_sample(
            docs, group_col=domain_col, cap=domain_cap, id_col="doc_id"
        ).drop(domain_col)
        stages["domain_capped"] = docs.count()

    # 3. transitive near-dup removal (LSH pairs → components → min-id rep)
    pairs = D.lsh_candidate_pairs(docs, id_col="doc_id")
    comps = D.connected_components(docs, pairs, id_col="doc_id")
    docs = D.dedup_by_components(docs, comps, id_col="doc_id")
    stages["deduped"] = docs.count()

    # 4. Gopher-style quality gate (pure column expressions)
    if quality_gate:
        docs = docs.filter(gopher_pass_col(gopher_signal_cols("text")))
        stages["quality_gated"] = docs.count()

    # 4b. optional DSIR domain targeting: score every doc against the
    # target-language slice and keep the top fraction by importance weight
    # (deterministic: weight desc, doc_id tie-break)
    if dsir_target_lang is not None:
        from pyspark.sql.window import Window

        w = curation.dsir_log_weights(
            docs.select("doc_id", "text"),
            docs.filter(F.col("lang") == dsir_target_lang).select("text"),
        ).select("doc_id", "log_weight")
        # rank the SLIM (id, weight) frame — the global total-order sort
        # moves two columns, never text — then semi-join the keep set back
        keep = (
            w.withColumn(
                "__pr",
                F.percent_rank().over(
                    Window.orderBy(F.desc("log_weight"), F.asc("doc_id"))
                ),
            )
            .filter(F.col("__pr") <= dsir_keep_frac)
            .select("doc_id")
        )
        docs = docs.join(keep, "doc_id", "left_semi")
        stages["dsir_selected"] = docs.count()

    # 5. token counts once — mixing, selection, and packing all reuse them
    docs = docs.withColumn("n_tokens", estimate_tokens_col("text"))

    # 6. token-budget domain mixing (target shares → keep fractions)
    if mix_targets:
        fractions = curation.mix_fractions(
            docs, "lang", "n_tokens", mix_targets, budget_tokens
        )
        docs = curation.stratified_sample(
            docs, id_col="doc_id", strata_col="lang", fractions=fractions
        )
        stages["mixed"] = docs.count()

    # 7. optional weighted selection (token-weighted, deterministic)
    if select_k:
        docs = curation.weighted_sample(
            docs, k=select_k, id_col="doc_id", weight_col="n_tokens"
        ).drop("priority")
        stages["selected"] = docs.count()

    # 8. greedy sequence packing into fixed token budgets
    from vectordb_etl_spark.operators.packing import pack_sequences

    packed = pack_sequences(
        docs.select("doc_id", "n_tokens"),
        id_col="doc_id",
        token_col="n_tokens",
        budget=pack_budget,
        target_rows_per_bucket=100_000,
    ).join(docs, "doc_id")
    stages["packed_rows"] = packed.count()
    return packed, stages


def main() -> int:
    from vectordb_etl_spark.session import get_spark
    from vectordb_etl_spark.store.layout import write_training_shards

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="training_shards_"
    )
    spark = get_spark("training-data-prep")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    packed, stages = prepare_training_data(
        spark,
        docs,
        mix_targets={"en": 0.6, "zh": 0.4},
        budget_tokens=100_000,
    )
    write_training_shards(packed, f"{out}/shards", shards_per_bucket=1)
    stages["out"] = f"{out}/shards"
    print(json.dumps(stages))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
