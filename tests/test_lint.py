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
                            # same class as ann.py's centroid artifact);
                            # connected_components _sig: 1-row per-round
                            # convergence signature — the fixpoint decision
                            # is inherently driver-side, same class as the
                            # isEmpty()/count() probes the loops always used
        "graph_ann.py",     # shard_sizes/rebalance_hint: one count row per
                            # shard (rows = segment count, bounded by the
                            # index layout, size-independent of corpus
                            # rows) — the segment-manager telemetry has to
                            # reach the driver to decide compact()
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
    """The static _PRIORITY fallback must still cover the registry: if the
    live rotation ever falls back to it, a query missing from the list
    silently sorts into the unordered middle and can dodge the head-50
    window for rounds (the r06/r07 staleness defect); a duplicate would
    double-spend the window."""
    import __spark_entry__ as em

    names = list(em.queries())
    assert len(em._PRIORITY) == len(set(em._PRIORITY)), "duplicate in _PRIORITY"
    missing = set(names) - set(em._PRIORITY)
    stale = set(em._PRIORITY) - set(names)
    assert not missing, f"registered but not in rotation: {sorted(missing)}"
    assert not stale, f"in rotation but not registered: {sorted(stale)}"


def test_rotation_head50_is_the_stalest_tier():
    """The driver only gates the FIRST 50 queries() entries, so an
    ordering whose head re-checks already-fresh queries lets the stale
    tail age unbounded (the defect recurred r06-r08 while the order was a
    manually-regenerated list). Since r09 queries()/oracle_sql() compute
    the order LIVE from the committed CORRECTNESS_r*.json files
    (__spark_entry__._dynamic_rotation); this lint asserts (a) the live
    path is actually active — not silently falling back to the static
    snapshot — and (b) the driver-visible head-50 equals the canonical
    stalest tier (reds, then never-checked, then oldest
    last-driver-green) recomputed here independently."""
    import sys

    import __spark_entry__ as em

    names = list(em.queries())
    assert em._dynamic_rotation(tuple(names)) is not None, (
        "live rotation unavailable — queries() is serving the static "
        "fallback snapshot, which goes stale the moment a new "
        "CORRECTNESS_r*.json lands"
    )

    tools = str(Path(__file__).resolve().parent.parent / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from plan_rotation import rotation_order

    order, last, red = rotation_order(names)
    cap = min(50, len(order))
    want = set(order[:cap])
    got = set(names[:cap])
    if want != got:
        should = sorted(want - got, key=lambda n: (n in red and -red[n], last[n], n))
        extra = sorted(got - want, key=lambda n: (last[n], n))
        raise AssertionError(
            "driver-visible head-50 is not the stalest tier.\n"
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


def test_compact_record_fits_budget_property():
    """Property over arbitrary payload inflation: compact_record must
    ALWAYS emit a parseable line within the driver window (an
    over-budget line records as a null BENCH), with the scalar
    identity fields (value, n_queries) intact no matter how much the
    trimmable containers grew."""
    import json
    import sys

    from hypothesis import given, settings
    from hypothesis import strategies as st

    sys.path.insert(0, str(PKG.parent))
    import bench

    real = json.loads((PKG.parent / "bench_full.json").read_text())

    @settings(max_examples=25, deadline=None)
    @given(
        nq=st.integers(0, 300), qlen=st.integers(1, 80),
        n_probe=st.integers(0, 40), plen=st.integers(1, 60),
        nc=st.integers(0, 40),
    )
    def prop(nq, qlen, n_probe, plen, nc):
        patho = dict(real)
        patho["queries"] = {f"q{'x' * qlen}{i}": 1.0 for i in range(nq)}
        patho["scale_probe"] = {
            f"p{'y' * plen}{i}": {"exponent": 0.5} for i in range(n_probe)
        }
        patho["convergence_depths"] = {
            f"c{'z' * plen}{i}": 7 for i in range(nc)
        }
        line = bench.compact_record(patho)
        assert len(line) <= bench.COMPACT_BUDGET
        parsed = json.loads(line)
        assert parsed["n_queries"] == nq
        assert parsed["value"] == real["value"]
        assert parsed["detail"] == "bench_full.json"

    prop()


def test_rotation_auto_advances_when_next_scoreboard_lands(tmp_path):
    """The point of the live rotation: the moment the driver's next
    CORRECTNESS file is committed, the head-50 must move PAST the
    just-checked queries to the next-stalest tier with no manual step.
    Simulated by copying the real scoreboards to a temp dir and adding a
    synthetic next-round file that marks the current head-50 green."""
    import json
    import shutil
    import sys

    import __spark_entry__ as em

    tools = str(Path(__file__).resolve().parent.parent / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from plan_rotation import rotation_order

    repo = Path(__file__).resolve().parent.parent
    existing = sorted(repo.glob("CORRECTNESS_r*.json"))
    assert existing, "no committed scoreboards to simulate from"
    for f in existing:
        shutil.copy(f, tmp_path / f.name)

    names = list(em.queries())
    order_now, _, _ = rotation_order(names, rounds_dir=tmp_path)
    head_now = order_now[:50]

    nxt = max(int(f.stem.split("_r")[1]) for f in existing) + 1
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    (tmp_path / f"CORRECTNESS_r{nxt:02d}.json").write_text(
        json.dumps({q: green for q in head_now})
    )

    order_after, last_after, _ = rotation_order(names, rounds_dir=tmp_path)
    head_after = set(order_after[:50])
    # the freshly-checked queries leave the window entirely...
    assert not (head_after & set(head_now)), (
        "just-checked queries still occupy window slots"
    )
    # ...and the window now holds exactly the stalest survivors
    survivors = sorted(
        (n for n in names if n not in set(head_now)),
        key=lambda n: (last_after[n], n),
    )
    assert head_after == set(survivors[:50])

    # a RED result, by contrast, must jump the queue immediately
    red_q = head_now[0]
    bad = {"rows_match": True, "schema_match": True, "hash_match": False}
    (tmp_path / f"CORRECTNESS_r{nxt:02d}.json").write_text(
        json.dumps({**{q: green for q in head_now}, red_q: bad})
    )
    order_red, _, red_map = rotation_order(names, rounds_dir=tmp_path)
    assert order_red[0] == red_q and red_q in red_map


def test_rotation_order_invariants_on_random_histories(tmp_path):
    """Property-fuzz the rotation mechanism the driver gate now rides on:
    for ANY scoreboard history, the order must be (1) a permutation of
    the registered names, (2) reds first sorted newest-red-first then
    name, (3) never-checked next alphabetical, (4) the rest oldest
    last-green first then name — and a red stays red until a LATER green
    clears it."""
    import json
    import random
    import sys

    tools = str(Path(__file__).resolve().parent.parent / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from plan_rotation import rotation_order

    rng = random.Random(7)
    names = [f"q{i:03d}" for i in range(60)]
    for trial in range(25):
        d = tmp_path / f"t{trial}"
        d.mkdir()
        # build a random history: 1-6 rounds, each checking a random
        # subset with random verdicts (greens heavily favored)
        expect_last: dict[str, int] = {n: 0 for n in names}
        expect_red: dict[str, int] = {}
        n_rounds = rng.randint(1, 6)
        for rnd in range(1, n_rounds + 1):
            window = rng.sample(names, rng.randint(0, 50))
            body = {}
            for q in window:
                green = rng.random() < 0.85
                body[q] = {
                    "rows_match": True,
                    "schema_match": True,
                    "hash_match": green,
                }
                expect_last[q] = max(expect_last[q], rnd)
                if green:
                    expect_red.pop(q, None)
                else:
                    expect_red[q] = rnd
            (d / f"CORRECTNESS_r{rnd:02d}.json").write_text(json.dumps(body))

        order, last, red = rotation_order(names, rounds_dir=d)
        assert sorted(order) == sorted(names)
        assert last == expect_last and red == expect_red
        reds = sorted(expect_red, key=lambda n: (-expect_red[n], n))
        never = sorted(
            n for n in names if expect_last[n] == 0 and n not in expect_red
        )
        rest = sorted(
            (n for n in names if expect_last[n] > 0 and n not in expect_red),
            key=lambda n: (expect_last[n], n),
        )
        assert order == reds + never + rest


def test_rotation_cycle_bound_every_query_checked_within_ceil(tmp_path):
    """Worst-case staleness is structural (VERDICT r11 item 7): with the
    stalest-first pick and a head-50 driver window, EVERY query is
    re-checked within ceil(N/50) rounds — simulate the driver loop from
    a cold start and assert the bound holds exactly, and that
    bench.rotation_age reports the same cycle bound."""
    import json
    import sys

    tools = str(Path(__file__).resolve().parent.parent / "tools")
    if tools not in sys.path:
        sys.path.insert(0, tools)
    from plan_rotation import rotation_order

    names = [f"q{i:03d}" for i in range(194)]
    cycle = -(-len(names) // 50)  # 4
    green = {"rows_match": True, "schema_match": True, "hash_match": True}
    checked_round: dict[str, int] = {}
    first_checked: dict[str, int] = {}
    for rnd in range(1, 2 * cycle + 1):
        order, _, _ = rotation_order(names, rounds_dir=tmp_path)
        head = order[:50]
        (tmp_path / f"CORRECTNESS_r{rnd:02d}.json").write_text(
            json.dumps({q: green for q in head})
        )
        for q in head:
            prev = checked_round.get(q)
            if prev is not None:
                assert rnd - prev <= cycle, (q, prev, rnd)
            first_checked.setdefault(q, rnd)
            checked_round[q] = rnd
    # cold start: everything seen within the first cycle...
    assert all(first_checked[q] <= cycle for q in names)
    # ...and the second cycle re-checked everything (no starvation)
    assert all(checked_round[q] > cycle for q in names)

    sys.path.insert(0, str(PKG.parent))
    import bench

    import __spark_entry__ as em

    age = bench.rotation_age(list(em.queries()))
    assert age["cycle"] == -(-len(em._QUERIES) // 50)


def test_bench_noise_comparator_flags_uniform_drift():
    """VERDICT r10 item 5: uniform same-direction drift = host load, not
    plans — the flag must fire on >=80% same-direction rows and stay off
    on mixed drift or thin overlap."""
    import sys

    sys.path.insert(0, str(PKG.parent))
    import bench

    prev = ("BENCH_r99", {f"q{i}": 1.0 for i in range(20)}, 0.1)
    up = {f"q{i}": 1.1 for i in range(20)}          # everything +10%
    down = {f"q{i}": 0.9 for i in range(20)}        # everything -10%
    mixed = {f"q{i}": (1.2 if i % 2 else 0.8) for i in range(20)}

    assert bench.noise_comparison(up, prev, sf=0.1)["suspect"] is True
    assert bench.noise_comparison(down, prev, sf=0.1)["suspect"] is True
    m = bench.noise_comparison(mixed, prev, sf=0.1)
    assert m["suspect"] is False and m["n_common"] == 20
    # thin overlap or no prior record: never suspect
    assert bench.noise_comparison({"q0": 2.0}, prev, sf=0.1)["suspect"] is False
    assert bench.noise_comparison(up, None, sf=0.1)["suspect"] is False
    # cross-sf comparison is meaningless — skipped, never suspect
    skip = bench.noise_comparison(up, prev, sf=0.01)
    assert skip["suspect"] is False and "skipped" in skip
    # per-row ratios ride the full record
    assert bench.noise_comparison(up, prev, sf=0.1)["ratios"]["q3"] == 1.1


def test_bench_previous_round_queries_reads_committed_record():
    import sys

    sys.path.insert(0, str(PKG.parent))
    import bench

    got = bench.previous_round_queries(PKG.parent)
    assert got is not None
    name, queries, sf = got
    assert name.startswith("BENCH_r") and len(queries) >= 5
    assert all(isinstance(v, float) for v in queries.values())
    assert sf == 0.1  # the driver records at sf0.1


def test_bench_rotation_age_telemetry():
    import sys

    sys.path.insert(0, str(PKG.parent))
    import __spark_entry__ as entry
    import bench

    age = bench.rotation_age(entry._QUERIES)
    # repo has 10 rounds of committed scoreboards: every age signal real
    assert age["oldest"] >= 1
    # never-checked count is >=0 and bounded by the registry (it is >0
    # only in rounds that register new queries — do NOT pin >0 here)
    assert 0 <= age["never"] <= len(entry._QUERIES)


def test_bench_compact_carries_new_telemetry_under_budget():
    """noise/rotation/graph_serve_skew ride the compact line as scalars
    (never the per-row ratios) and the committed real record still fits
    the driver window with them attached."""
    import json
    import sys

    sys.path.insert(0, str(PKG.parent))
    import bench

    real = json.loads((PKG.parent / "bench_full.json").read_text())
    real = dict(real)
    real["noise_vs_prev"] = {
        "suspect": True, "frac_up": 0.95, "drift_med": 1.18,
        "n_common": 22, "vs": "BENCH_r10",
        "ratios": {f"q{i}": 1.18 for i in range(22)},
    }
    real["rotation_age"] = {"oldest": 7, "never": 2, "cycle": 4}
    real["graph_serve_skew"] = {
        "t_skew": 2.0, "t_balanced": 1.4, "t_compacted": 1.45,
        "penalty": 1.43, "penalty_compacted": 1.04,
        "n_shards": 10, "max_shard": 1000, "median_shard": 100,
        "max_over_median": 10.0, "max_over_median_compacted": 1.1,
        "recommend_compact_before": True, "recommend_compact_after": False,
        "derived_add_shards": 9, "note": "x",
    }
    # r12 widens sf1_checks to six rows (three dedup headliners + the two
    # serve tiers + etl); the compact line keeps one scalar per row
    real["sf1_checks"] = dict(real.get("sf1_checks") or {})
    for extra in ("ivf_serve", "graph_serve", "etl_pipeline"):
        real["sf1_checks"][extra] = {
            "t_1x": 1.0, "t_sf1": 3.0, "measured_exponent": 0.48,
            "design_exponent": 1.0, "measured_over_predicted": 0.3,
            "note": "x",
        }
    line = bench.compact_record(real)
    assert len(line) <= bench.COMPACT_BUDGET
    parsed = json.loads(line)
    assert parsed["noise"] == {
        "suspect": True, "frac_up": 0.95, "drift_med": 1.18,
        "vs": "BENCH_r10",
    }
    assert "ratios" not in json.dumps(parsed["noise"])
    assert parsed["rotation"] == {"oldest": 7, "never": 2, "cycle": 4}
    assert parsed["graph_serve_skew"] == {
        "penalty": 1.43, "skew": 10.0, "penalty_c": 1.04,
    }
    # headline rows still all survive the budget with telemetry attached
    assert set(parsed["queries"]) == {
        q for q in bench.HEADLINE_QUERIES if q in real["queries"]
    }
