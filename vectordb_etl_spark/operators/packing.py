"""Sequence packing — greedy token-budget bin packing of chunks into
fixed-capacity training sequences (beyond-reference tier; the standard
LLM pre-training batch-prep step: concatenate documents up to the context
length so padding ≈ 0).

Distribution shape: packing is inherently SEQUENTIAL (each pack decision
depends on the running fill), so the corpus is split into hash BUCKETS and
the greedy fold runs per bucket inside ``applyInPandas`` — one shuffle on
the bucket key, parallelism = number of buckets, each bucket's fold is a
tiny in-memory loop. Bucket-local packing is the standard trade: packs
never span buckets (negligible padding loss for buckets ≫ budget) in
exchange for embarrassing parallelism at 100 TB.

Determinism: items are processed in ``id_col`` order within their bucket,
and the bucket comes from the ENGINE-PORTABLE md5 expression shared with
the curation sampler (functions/curation.py) — so the assignment is a pure
function of (ids, token counts, budget, buckets) that a DuckDB recursive
CTE can state identically as the correctness oracle
(see ``pack_sequences_sql``).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from vectordb_etl_spark.functions.curation import (
    sample_bucket_col,
    sample_bucket_sql,
)


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    budget: int = 2048,
    buckets: int | None = None,
    target_rows_per_bucket: int = 1_000_000,
) -> DataFrame:
    """Assign every row to a (bucket, pack_id) training sequence.

    Greedy first-fit-in-order: walk the bucket's rows by ``id_col``; when
    the running fill would exceed ``budget``, close the pack and start the
    next (the first row of a bucket always opens pack 0 — identical to the
    oracle CTE's base case, including zero-token rows). An item larger than
    the whole budget gets a pack of its own (callers should pre-split
    oversize docs — the chunker's job). Returns (id_col, bucket, pack_id,
    pack_fill) where ``pack_fill`` is the pack's total token count after
    its final member.

    Memory contract: each md5 bucket is materialized as ONE pandas
    DataFrame of (id, token) pairs inside ``applyInPandas`` — the bucket's
    row count, not its text size, is what must fit a task. When ``buckets``
    is None (default) the count is derived from a cheap ``df.count()`` so
    no bucket expects more than ``target_rows_per_bucket`` rows (md5 keys
    are uniform, so bucket sizes concentrate tightly around n/buckets).
    Pass an explicit ``buckets`` to skip the count job — required when an
    external oracle (``pack_sequences_sql``) must state the identical
    bucket assignment. NULL token counts fail loudly with the offending
    ids rather than crashing inside ``astype``."""
    if buckets is None:
        n = df.select(id_col).count()
        buckets = max(1, -(-n // target_rows_per_bucket))
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, bucket int, pack_id int, pack_fill long"
    )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col).reset_index(drop=True)
        toks = pdf[token_col]
        if toks.isna().any():
            bad = pdf.loc[toks.isna(), id_col].head(5).tolist()
            raise ValueError(
                f"pack_sequences: NULL {token_col} for ids {bad} — "
                "token counts must be non-null (filter or fill upstream)"
            )
        pack_ids, fills = [], []
        pack, fill = 0, 0
        for i, tok in enumerate(toks.astype("int64")):
            tok = int(tok)
            # matches the oracle CTE exactly: the base row (i == 0) always
            # stays in pack 0; later rows open a new pack whenever the
            # running fill would exceed budget — even when fill == 0
            # (zero-token run), so Spark and DuckDB agree bit-for-bit
            if i > 0 and fill + tok > budget:
                pack += 1
                fill = 0
            fill += tok
            pack_ids.append(pack)
            fills.append(fill)
        out = pdf[[id_col, "bucket"]].copy()
        out["pack_id"] = pd.Series(pack_ids, dtype="int32")
        # report the FINAL fill of each pack on every member row
        final = {}
        for p, f in zip(pack_ids, fills):
            final[p] = f
        out["pack_fill"] = pd.Series(
            [final[p] for p in pack_ids], dtype="int64"
        )
        return out

    bucketed = df.select(
        id_col,
        F.col(token_col).cast("long").alias(token_col),
        (sample_bucket_col(id_col) % buckets).cast("int").alias("bucket"),
    )
    return bucketed.groupBy("bucket").applyInPandas(_pack, out_schema)


def pack_sequences_sql(
    table: str,
    id_expr: str,
    token_expr: str,
    budget: int = 2048,
    buckets: int = 16,
    out_id: str = "id",
) -> str:
    """DuckDB oracle: the same greedy fold as a recursive CTE walking each
    bucket's rows in id order carrying (fill, pack) state; the bucket uses
    the shared md5 expression, so both engines agree bit-for-bit."""
    bucket = f"({sample_bucket_sql(id_expr)} % {buckets})"
    return f"""
WITH RECURSIVE items AS MATERIALIZED (
  SELECT {id_expr} AS id, CAST({token_expr} AS BIGINT) AS tok,
         CAST({bucket} AS INT) AS bucket,
         row_number() OVER (PARTITION BY {bucket} ORDER BY {id_expr}) AS rn
  FROM {table}
),
walk AS (
  SELECT bucket, rn, id, tok, tok AS fill, 0 AS pack
  FROM items WHERE rn = 1
  UNION ALL
  SELECT i.bucket, i.rn, i.id, i.tok,
         CASE WHEN w.fill + i.tok > {budget} THEN i.tok
              ELSE w.fill + i.tok END,
         CASE WHEN w.fill + i.tok > {budget} THEN w.pack + 1
              ELSE w.pack END
  FROM items i JOIN walk w ON i.bucket = w.bucket AND i.rn = w.rn + 1
)
SELECT w.id AS {out_id}, w.bucket, CAST(w.pack AS INT) AS pack_id,
       CAST(max(w.fill) OVER (PARTITION BY w.bucket, w.pack) AS BIGINT)
         AS pack_fill
FROM walk w
"""
