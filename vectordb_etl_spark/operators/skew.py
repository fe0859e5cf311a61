"""Skew-resistant aggregation patterns for low-cardinality grouping keys.

Why this exists: at 100 TB a ``groupBy`` on a handful of key values (e.g.
``event_type`` with 5 distinct values) concentrates all final-aggregation
state for each key on a single reducer. For *decomposable* built-in
aggregates (sum/count/min/max/avg) Spark's HashAggregate already emits
map-side partials, so the final shuffle carries only
``num_map_tasks x num_keys`` rows and skew is a non-issue — do NOT salt
those, it just adds a shuffle.

The case that genuinely breaks is **non-decomposable aggregation state** —
``collect_set``-style accumulation, exact per-key percentiles, custom
UDAF/``applyInPandas`` state — where Catalyst has no partial-aggregate or
distinct rewrite and one hot key means one reducer materializing that key's
entire value set. (Plain single ``count(DISTINCT v)`` is *already* fine:
Catalyst dedups on ``(key, value)`` and combines pre-counted partials, as
the plan test in tests/test_skew.py documents.) The salted two-phase trick
bounds per-task state while staying provably exact, because the salt is a
*hash of the value*, not a random number:

  phase 1: group by ``(key, pmod(hash(value), num_salts))`` and count
           distinct values *within* each salt bucket. The same value always
           hashes to the same bucket, so buckets partition the distinct
           value set — per-bucket distinct counts are additive.
  phase 2: group by ``key`` and sum the per-bucket counts.

Both phases' reducer state is bounded by ``|distinct values| / num_salts``
per task instead of ``|distinct values|`` for the hottest key, and both are
plain hash aggregations that AQE can coalesce. ``salted_count_distinct`` is
the oracle-checkable instance of this identity (bit-identical to
``count(DISTINCT value)`` — ``salted_distinct_users_by_type`` in
``__spark_entry__.py``); swap the phase-1 ``count_distinct`` for
``collect_set``/``percentile``/a UDAF and the same layout carries the
non-decomposable cases.

Beyond-reference operator (the reference has no aggregation engine at all:
its only distinct-ish op is the md5 chunk dedup, modules/chunker.py:182-207).
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_count_distinct(
    df: DataFrame,
    keys: Iterable[str],
    value_col: str,
    *,
    num_salts: int = 64,
    out_name: str | None = None,
) -> DataFrame:
    """Exact ``count(DISTINCT value_col)`` per ``keys``, skew-resistant.

    Equivalent to ``df.groupBy(*keys).agg(countDistinct(value_col))``
    including for groups whose values are ALL NULL (they appear with count
    0, exactly like countDistinct) — NULL rows are kept through phase 1
    (they land in hash(NULL)'s bucket, where ``count_distinct`` already
    ignores them and contributes 0) rather than filtered out, which would
    silently drop those grouping keys from the output.
    """
    keys = list(keys)
    out = out_name or f"distinct_{value_col}"
    salt = F.pmod(F.hash(F.col(value_col)), F.lit(num_salts)).alias("__salt")
    per_bucket = df.groupBy(*keys, salt).agg(
        F.count_distinct(F.col(value_col)).alias("__bucket_distinct")
    )
    return per_bucket.groupBy(*keys).agg(F.sum("__bucket_distinct").alias(out))


def approx_distinct(
    df: DataFrame,
    keys: Iterable[str],
    value_col: str,
    *,
    rsd: float = 0.05,
    out_name: str | None = None,
) -> DataFrame:
    """Approximate per-key distinct count (HyperLogLog++) — the other end
    of the exactness/cost trade from :func:`salted_count_distinct`.

    Where the salted-exact form pays two shuffles and per-bucket distinct
    state, HLL state is a FIXED-size sketch (~1.5/rsd² bytes) per key that
    merges associatively — map-side partials shrink the shuffle to
    num_tasks × num_keys sketches regardless of value cardinality, and a
    hot key costs the same as a cold one (skew-immune by construction).
    At 100 TB: use exact when the count feeds billing/dedup decisions,
    HLL when it feeds dashboards/monitoring (A-tier stats). Not
    oracle-checkable (sketch internals are engine-specific) — verified by
    the rsd error-bound test instead."""
    keys = list(keys)
    out = out_name or f"approx_distinct_{value_col}"
    return df.groupBy(*keys).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias(out)
    )


def salted_agg(
    df: DataFrame,
    keys: Iterable[str],
    aggs: dict[str, tuple[str | Column, str]],
    *,
    num_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation for *decomposable* aggregates.

    ``aggs`` maps output column name -> (input column, kind) with kind in
    {"sum", "count", "min", "max", "avg"}. Provided for aggregation paths
    where map-side partial aggregation is unavailable (e.g. downstream of a
    UDAF or after an explicit repartition that pins the exchange); for plain
    built-in aggregates prefer ``df.groupBy(...).agg(...)`` — Spark's
    partial HashAggregate already neutralizes key skew there (see module
    docstring). Results are exactly equal to the unsalted aggregation
    (avg is combined as sum-of-sums / sum-of-counts, not avg-of-avgs).
    """
    keys = list(keys)
    partials: list[Column] = []
    finals: list[Column] = []
    for name, (col, kind) in aggs.items():
        c = F.col(col) if isinstance(col, str) else col
        if kind == "count":
            partials.append(F.count(c).alias(f"__c_{name}"))
            finals.append(F.sum(f"__c_{name}").alias(name))
        elif kind == "sum":
            partials.append(F.sum(c).alias(f"__s_{name}"))
            finals.append(F.sum(f"__s_{name}").alias(name))
        elif kind == "min":
            partials.append(F.min(c).alias(f"__mn_{name}"))
            finals.append(F.min(f"__mn_{name}").alias(name))
        elif kind == "max":
            partials.append(F.max(c).alias(f"__mx_{name}"))
            finals.append(F.max(f"__mx_{name}").alias(name))
        elif kind == "avg":
            partials.append(F.sum(c).alias(f"__as_{name}"))
            partials.append(F.count(c).alias(f"__ac_{name}"))
            finals.append(
                (F.sum(f"__as_{name}") / F.sum(f"__ac_{name}")).alias(name)
            )
        else:
            raise ValueError(f"non-decomposable agg kind: {kind!r}")
    salt = (F.rand(seed=0) * num_salts).cast("int")
    phase1 = df.withColumn("__salt", salt).groupBy(*keys, "__salt").agg(*partials)
    return phase1.groupBy(*keys).agg(*finals)


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    num_salts: int = 16,
    salt_source: str | None = None,
    how: str = "inner",
) -> DataFrame:
    """Skew-resistant fact⋈dim equi-join: identical results to
    ``fact.join(dim, on, how)`` with the hot key's rows spread over
    ``num_salts`` reducers.

    The fact side gets a salt derived from ``salt_source`` (any
    fact-side column that varies within a key — defaults to the first
    non-key column), the dim side is EXPLODED ×num_salts (every dim row
    exists under every salt), and the join key becomes (key, salt). A hot
    fact key now lands on num_salts partitions instead of one; the dim
    inflation is num_salts×|dim| — cheap when dim is the small side, which
    is the only case where this beats just broadcasting dim (do THAT when
    dim fits in memory; salt when dim is too big to broadcast but still
    much smaller than fact). AQE's skew-join split handles the same
    problem adaptively at runtime; this operator is the deterministic,
    plan-stable form for known-hot keys.

    Supports how ∈ {'inner', 'left'} (semantics preserved: dim replication
    never duplicates matches because each fact row carries exactly one
    salt).

    ``salt_source`` must VARY within a join key: a column that is constant
    per key hashes every row of that key to the same salt, silently
    defeating the mitigation (results stay correct — it degrades to the
    plain join's distribution). Row-unique columns (an id, a timestamp)
    are ideal; pass one explicitly when the first non-key column is not."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner' or 'left'")
    if salt_source is None:
        candidates = [c for c in fact.columns if c != on]
        if not candidates:
            raise ValueError(
                "salted_join: fact side has only the join column, so no "
                "salt can be derived — pass salt_source= a column that "
                "varies within a key, or add one (e.g. "
                "F.monotonically_increasing_id())"
            )
        src = candidates[0]
    else:
        src = salt_source
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.hash(F.col(src)), F.lit(num_salts))
    )
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = salted_fact.join(salted_dim, [on, "__salt"], how)
    return out.drop("__salt")


def skew_report(
    df: DataFrame,
    key_cols: list[str],
    top_n: int = 10,
    skew_factor: int = 8,
) -> DataFrame:
    """Shuffle-key skew diagnostic — the report to run BEFORE keying a
    big join/agg on a column at 100 TB: per candidate hot key, its row
    count, its share of the table in ppm, the ratio to the mean key load
    (micro-units), and the salt factor that would level it. A key whose
    ``load_ratio_micro`` is ≥ ``skew_factor``× the mean is flagged with
    ``salt_recommended`` = ceil(count / mean) capped at 256 — the spread
    that brings its per-task load back to the mean (what
    :func:`salted_agg` / :func:`salted_join` consume as ``salt``).

    Scale shape: one map-side-combined count per key, then
    TakeOrderedAndProject for the top-n — the diagnostic never shuffles
    more than (distinct keys) rows, and integer micro arithmetic keeps it
    oracle-checkable."""
    # coalesce each part to '' BEFORE concat: Spark's concat_ws skips
    # NULLs (separator and all) while DuckDB's || nulls the whole key —
    # pinning empty-string semantics keeps the two engines identical
    key = F.concat_ws(
        "\x1f",
        *[F.coalesce(F.col(c).cast("string"), F.lit("")) for c in key_cols],
    )
    counts = (
        df.select(key.alias("key"))
        .groupBy("key")
        .agg(F.count("*").alias("n"))
    )
    tot = counts.agg(
        F.sum("n").alias("total_rows"),
        F.count("*").alias("n_keys"),
    )
    top = (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            F.expr("(1000000 * n) DIV total_rows").alias("share_ppm"),
            # mean key load = total/n_keys; ratio in micro-units, both
            # truncating integer divisions (non-negative operands)
            F.expr("(1000000 * n * n_keys) DIV total_rows").alias(
                "load_ratio_micro"
            ),
            F.expr(
                f"CASE WHEN (n * n_keys) >= {skew_factor} * total_rows "
                "THEN least(CAST(256 AS BIGINT), "
                "(n * n_keys + total_rows - 1) DIV total_rows) "
                "ELSE CAST(0 AS BIGINT) END"
            ).alias("salt_recommended"),
        )
        .orderBy(F.desc("n"), "key")
        .limit(top_n)
    )
    return top


def skew_report_sql(
    source_sql: str,
    key_cols: list[str],
    top_n: int = 10,
    skew_factor: int = 8,
) -> str:
    """DuckDB twin of :func:`skew_report` (identical integer arithmetic;
    chr(31) is the same key separator Spark's concat_ws uses)."""
    key = " || chr(31) || ".join(
        f"coalesce(CAST({c} AS VARCHAR), '')" for c in key_cols
    )
    return f"""
WITH counts AS (
  SELECT {key} AS key, CAST(count(*) AS BIGINT) AS n
  FROM ({source_sql}) GROUP BY 1
), tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS total_rows,
         CAST(count(*) AS BIGINT) AS n_keys FROM counts
)
SELECT key, n,
       (1000000 * n) // total_rows AS share_ppm,
       (1000000 * n * n_keys) // total_rows AS load_ratio_micro,
       CASE WHEN (n * n_keys) >= {skew_factor} * total_rows
            THEN least(CAST(256 AS BIGINT),
                       (n * n_keys + total_rows - 1) // total_rows)
            ELSE CAST(0 AS BIGINT) END AS salt_recommended
FROM counts CROSS JOIN tot
ORDER BY n DESC, key LIMIT {top_n}
"""
