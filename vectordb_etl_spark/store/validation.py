"""Relational validation — dbt-test-style checks as ONE lazy plan
(beyond-reference tier; pairs with quality.py's corpus-level checks).

Each check is a tiny aggregate: orphan foreign keys via a left-anti join
on the key pair, primary-key uniqueness via groupBy-having. The union of
1-row results is the report; zeros are the healthy state. At 100 TB each
check shuffles only its own key columns — validation cost scales with the
checked relation, never the table width — and the whole report is a
single job."""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_check(
    name: str, child: DataFrame, child_key: str, parent: DataFrame, parent_key: str
) -> DataFrame:
    """1-row (check_name, violations): child rows whose key has no parent.

    NULL semantics follow the dbt relationship-test convention: NULL child
    keys are NOT violations (use a separate not-null check for those) —
    they're filtered before the anti-join. This also keeps the operator
    aligned with a NOT EXISTS SQL restatement regardless of parent-side
    NULLs (a NOT IN oracle would return zero violations the moment any
    parent key is NULL — the classic three-valued-logic trap)."""
    c = child.select(F.col(child_key)).filter(F.col(child_key).isNotNull())
    p = parent.select(F.col(parent_key))
    return (
        c.join(p, c[child_key] == p[parent_key], "left_anti")
        .agg(F.count("*").alias("violations"))
        .select(F.lit(name).alias("check_name"), "violations")
    )


def unique_check(name: str, df: DataFrame, key: str) -> DataFrame:
    """1-row (check_name, violations): distinct key values occurring >1×."""
    return (
        df.groupBy(key)
        .agg(F.count("*").alias("__n"))
        .filter(F.col("__n") > 1)
        .agg(F.count("*").alias("violations"))
        .select(F.lit(name).alias("check_name"), "violations")
    )


def integrity_report(checks: list[DataFrame]) -> DataFrame:
    """Union the 1-row checks into one report DataFrame (one lazy plan)."""
    return reduce(lambda a, b: a.unionByName(b), checks)
