"""Multi-dimensional data layout — Z-order (Morton) clustering.

Beyond-reference tier: the reference engine stores its collections as
flat per-collection files (modules/vector_store.py — insert-ordered
parquet, no clustering), which is fine single-node but leaves multi-
predicate scans at 100 TB reading every file. Z-ordering is the
Delta/Iceberg-era answer: interleave the bits of several filter columns
into one sort key, range-partition and sort files by it, and min/max
file statistics become selective for EVERY interleaved column at once —
a box predicate prunes most files instead of just the leading sort
column's.

Two layers, deliberately split:

* :func:`zorder_key_col` — the Morton key as a PURE integer column
  expression (shift/mask/or terms, whole-stage codegen, no UDF), bit-
  identical in DuckDB (:func:`zorder_key_sql`) so it is oracle-checkable.
  Inputs are masked to the low ``bits`` bits; callers pass already-
  bounded ints (keys, day numbers, bucketed values).
* :func:`zorder_layout` — the layout writer: attaches the key,
  ``repartitionByRange`` on it (sampled range bounds — the right tool;
  the exact cut points don't need to be deterministic, only the ORDER),
  sorts within partitions, drops the key. One shuffle; at cluster scale
  each output task writes one locality-preserving file.

The pruning payoff is asserted empirically in tests/test_layout.py:
per-file min/max of BOTH dimensions shrink from full-range (insert
order) to tight boxes, and a box query's candidate-file set shrinks
accordingly — the same arithmetic a lakehouse manifest prune runs.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def zorder_key_col(cols: list[Column | str], bits: int = 16) -> Column:
    """Morton-interleave the low ``bits`` bits of each column: bit j of
    column c lands at position ``j * n_cols + c``. n_cols × bits must
    fit a bigint (≤ 62). Pure shift/mask/or expression tree — 2·n·bits
    JVM ops, no Python."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if n * bits > 62:
        raise ValueError(f"zorder key would need {n * bits} bits (> 62)")
    cs = [
        (F.col(c) if isinstance(c, str) else c).cast("bigint")
        for c in cols
    ]
    mask = (1 << bits) - 1
    terms = []
    for ci, c in enumerate(cs):
        masked = c.bitwiseAND(F.lit(mask))
        for j in range(bits):
            bit = F.shiftright(masked, j).bitwiseAND(F.lit(1))
            terms.append(F.shiftleft(bit, j * n + ci))
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def zorder_key_sql(cols: list[str], bits: int = 16) -> str:
    """The identical interleave as DuckDB SQL text (>>, &, << on
    BIGINT), for oracle twins of queries that sort/filter by the key."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder needs at least 2 columns")
    if n * bits > 62:
        raise ValueError(f"zorder key would need {n * bits} bits (> 62)")
    mask = (1 << bits) - 1
    terms = []
    for ci, c in enumerate(cols):
        m = f"(CAST({c} AS BIGINT) & {mask})"
        for j in range(bits):
            terms.append(f"((({m} >> {j}) & 1) << {j * n + ci})")
    return "(" + " | ".join(terms) + ")"


def zorder_layout(
    df: DataFrame,
    cols: list[Column | str],
    bits: int = 16,
    num_files: int | None = None,
) -> DataFrame:
    """Rewrite ``df`` into Z-order: range-partitioned and sorted by the
    Morton key of ``cols``. Write the result with ``.write.parquet`` to
    get one locality-tight file per partition. ``num_files`` defaults to
    the session shuffle parallelism."""
    key = zorder_key_col(cols, bits).alias("__zorder")
    with_key = df.withColumn("__zorder", key)
    parted = (
        with_key.repartitionByRange(num_files, "__zorder")
        if num_files
        else with_key.repartitionByRange("__zorder")
    )
    return parted.sortWithinPartitions("__zorder").drop("__zorder")
