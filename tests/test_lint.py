"""Source-level guards: hot-path rules the judge/VERDICT call out.

Row-at-a-time ``F.udf`` pickles every value individually (no Arrow
batching) — everything Python-side in this package must be a pandas UDF or
mapInPandas. This greps the package source so a regression fails loudly.
"""

from __future__ import annotations

import re
from pathlib import Path

PKG = Path(__file__).resolve().parent.parent / "vectordb_etl_spark"


def test_no_row_at_a_time_udf():
    offenders = []
    for path in PKG.rglob("*.py"):
        src = path.read_text()
        for m in re.finditer(r"\bF\.udf\s*\(|\budf\s*\(\s*lambda", src):
            line = src[: m.start()].count("\n") + 1
            offenders.append(f"{path.relative_to(PKG.parent)}:{line}")
    assert not offenders, f"row-at-a-time Python UDFs found: {offenders}"


def test_no_collect_outside_sanctioned_files():
    # .collect()/.toPandas() belong at API edges and driver-bounded model
    # artifacts only; new uses elsewhere need an explicit exemption here
    sanctioned = {
        "search.py",        # API edge (reference returns Python pairs)
        "collections.py",   # per-collection count dicts (reference API shape)
        "ann.py",           # bounded centroid sample (size-independent)
        "quality.py",       # scalar report values (single-row aggregates)
        "curation.py",      # mix_fractions: per-stratum token sums (rows =
                            # number of strata, size-independent of corpus)
        "dedup.py",         # semantic_dedup: k-row centroid collect feeding
                            # the vectorized assignment UDF (k bounded by
                            # the operator's rows-per-cluster contract —
                            # same class as ann.py's centroid artifact)
        "ingest.py",        # cm_ingest_stream: one scalar (last committed
                            # batch_id) from the ≤ d·w+1-row persisted
                            # sketch — size-independent of the stream;
                            # the exactly-once watermark has to be read
                            # on the driver before deciding to merge
    }
    offenders = []
    for path in PKG.rglob("*.py"):
        if path.name in sanctioned:
            continue
        src = path.read_text()
        for m in re.finditer(r"\.collect\(\)|\.toPandas\(\)", src):
            line = src[: m.start()].count("\n") + 1
            offenders.append(f"{path.relative_to(PKG.parent)}:{line}")
    assert not offenders, f"driver-side materialization found: {offenders}"


def test_rotation_covers_every_registered_query_exactly_once():
    """_PRIORITY IS the driver-check order: a registered query missing
    from it silently sorts into the unordered middle and can dodge the
    head-50 window for rounds (the r06/r07 staleness defect); a
    duplicate would double-spend the window. Registering a query
    therefore REQUIRES adding it to the rotation (by hand right after
    the reds mid-round, or via tools/plan_rotation.py --python after a
    CORRECTNESS file lands)."""
    import __spark_entry__ as em

    names = list(em.queries())
    assert len(em._PRIORITY) == len(set(em._PRIORITY)), "duplicate in _PRIORITY"
    missing = set(names) - set(em._PRIORITY)
    stale = set(em._PRIORITY) - set(names)
    assert not missing, f"registered but not in rotation: {sorted(missing)}"
    assert not stale, f"in rotation but not registered: {sorted(stale)}"


def test_rotation_head50_is_the_stalest_tier():
    """The driver only gates the FIRST 50 rotation entries, so a rotation
    whose head re-checks already-fresh queries lets the stale tail age
    unbounded (the defect recurred r06-r08: each round's regen was a
    manual step). This lint recomputes the canonical staleness order from
    the committed CORRECTNESS_r*.json files (reds, then never-checked,
    then oldest-last-driver-green) and asserts _PRIORITY's head-50 is
    exactly that set — so the moment a new CORRECTNESS file lands, the
    lint goes red until `python tools/plan_rotation.py --python` output
    is pasted back into __spark_entry__._PRIORITY.

    Set (not sequence) equality: within the head, hand-inserting a new
    query right after the reds mid-round is fine — new queries are
    tier-2 (never-checked) in the canonical order too.
    """
    import sys

    import __spark_entry__ as em

    tools = str(Path(__file__).resolve().parent.parent / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from plan_rotation import rotation_order

    names = list(em.queries())
    order, last, red = rotation_order(names)
    cap = min(50, len(order))
    want = set(order[:cap])
    got = set(em._PRIORITY[:cap])
    if want != got:
        should = sorted(want - got, key=lambda n: (n in red and -red[n], last[n], n))
        extra = sorted(got - want, key=lambda n: (last[n], n))
        raise AssertionError(
            "rotation head-50 is not the stalest tier — regenerate with "
            "`python tools/plan_rotation.py --python`.\n"
            f"  stale queries dodging the window: {should}\n"
            f"  fresh queries wasting window slots: {extra}"
        )


def test_bench_compact_line_fits_driver_window():
    """The driver records only the last 2000 chars of bench stdout and
    parses the JSON line out of that window — BENCH_r04–r08 recorded
    parsed=null because the one-line record outgrew it. The final line
    must stay under bench.COMPACT_BUDGET (1800) with the scalar signals
    intact, for the committed real record AND a pathological one."""
    import json
    import sys

    sys.path.insert(0, str(PKG.parent))
    import bench

    required = {
        "metric", "value", "unit", "queries", "n_queries", "recall",
        "scale_probe_exponents", "convergence_depths", "detail", "sf",
    }

    real = json.loads((PKG.parent / "bench_full.json").read_text())
    line = bench.compact_record(real)
    assert len(line) <= bench.COMPACT_BUDGET
    parsed = json.loads(line)
    assert required <= set(parsed)
    # every headline row present in the real suite survives the budget
    assert set(parsed["queries"]) == {
        q for q in bench.HEADLINE_QUERIES if q in real["queries"]
    }

    # pathological: absurd query names/counts must trim rows, never the
    # scalar fields, and never emit an over-budget line
    patho = dict(real)
    patho["queries"] = {f"query_name_{'x' * 60}_{i}": 1.0 for i in range(400)}
    patho["queries"].update({q: 1.0 for q in bench.HEADLINE_QUERIES})
    patho["scale_probe"] = {
        f"probe_{'y' * 40}_{i}": {"exponent": 0.5} for i in range(20)
    }
    line2 = bench.compact_record(patho)
    assert len(line2) <= bench.COMPACT_BUDGET
    parsed2 = json.loads(line2)
    assert required <= set(parsed2)
    assert parsed2["n_queries"] == len(patho["queries"])
