"""Executed-plan string inspection (the stable cross-version surface)."""

from __future__ import annotations

from pyspark.sql import DataFrame


def executed_plan(df: DataFrame) -> str:
    """The physical plan as text (pre-execution; AQE final plans may differ
    only by runtime coalescing, which never weakens the asserted shapes)."""
    return df._jdf.queryExecution().executedPlan().toString()


def pushed_filters(df: DataFrame) -> list[str]:
    """Filters pushed into the datasource scan, e.g.
    ``['IsNotNull(language)', 'EqualTo(language,korean)']``."""
    plan = executed_plan(df)
    out: list[str] = []
    for part in plan.split("PushedFilters: [")[1:]:
        body = part.split("]")[0]
        # split on commas at paren depth 0 only — filter args contain commas
        depth, cur = 0, []
        for ch in body:
            if ch == "," and depth == 0:
                if "".join(cur).strip():
                    out.append("".join(cur).strip())
                cur = []
                continue
            depth += ch == "("
            depth -= ch == ")"
            cur.append(ch)
        if "".join(cur).strip():
            out.append("".join(cur).strip())
    return out


def read_schema(df: DataFrame) -> str:
    """The column subset actually read from the scan (column pruning)."""
    plan = executed_plan(df)
    parts = plan.split("ReadSchema:")
    return parts[1].split("\n")[0].strip() if len(parts) > 1 else ""


def count_exchanges(df: DataFrame) -> int:
    """Number of hash-partition shuffles in the plan (broadcast exchanges and
    reused exchanges excluded) — the scale-critical number."""
    plan = executed_plan(df)
    reused = plan.count("ReusedExchange")
    return plan.count("Exchange hashpartitioning") - reused


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in executed_plan(df)


def has_partition_filter(df: DataFrame, col: str) -> bool:
    plan = executed_plan(df)
    for part in plan.split("PartitionFilters: [")[1:]:
        if col in part.split("]")[0]:
            return True
    return False


def uses_python_eval(df: DataFrame) -> bool:
    """True when the plan contains a Python evaluation node (Batch/Arrow
    EvalPython) — i.e., rows leave the JVM. The engine's contract: only the
    sanctioned pandas-UDF operators (parse/chunk/embed) may do this."""
    return "EvalPython" in executed_plan(df)
