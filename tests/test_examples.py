"""DAG-parity orchestration: the staged CLI sequence runs end-to-end as
separate processes with a path-only contract between stages (reference
dags/vectordb_etl_dag.py:265-318 — one process per task, paths via XCom)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))

from airflow_dags import run_staged_pipeline, staged_invocations  # noqa: E402

PAGE = """<html><head><title>{t}</title></head><body><h1>{t}</h1>{p}</body></html>"""


@pytest.fixture(scope="module")
def html_tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("dag_input")
    for folder in ("hr", "eng"):
        d = root / folder
        d.mkdir()
        for i in range(2):
            paras = "".join(
                f"<p>Handbook section {folder}-{i} paragraph {j}. "
                f"{'Policy details and procedures. ' * 6}</p>"
                for j in range(3)
            )
            (d / f"doc{i}.html").write_text(
                PAGE.format(t=f"{folder} {i}", p=paras), encoding="utf-8"
            )
    return root


@pytest.mark.slow
def test_staged_cli_pipeline_path_contract(html_tree, tmp_path_factory):
    work = tmp_path_factory.mktemp("dag_work")
    report = str(work / "report.json")
    invs = run_staged_pipeline(
        input_dir=str(html_tree),
        checkpoint_dir=str(work / "ckpt"),
        warehouse=str(work / "warehouse"),
        dimension=32,
        report_path=report,
    )
    assert [i.stage for i in invs] == [
        "extract", "transform", "load", "validate",
    ]
    ex, tr, ld, va = invs
    # XCom payloads: every stage pushed rows + its checkpoint path
    assert ex.xcom["rows"] == 4
    assert Path(ex.xcom["path"]).is_dir()  # documents.parquet
    assert tr.xcom["rows"] > 0
    assert Path(tr.xcom["path"]).is_dir()  # chunks.parquet
    # load saw the transform output (separate process — disk contract only)
    assert sum(ld.xcom["collections"].values()) == tr.xcom["rows"]
    assert set(ld.xcom["collections"]) == {"html_hr", "html_eng"}
    assert va.xcom["rows"] == tr.xcom["rows"]
    # the notify-stage aggregate: validate wrote the report JSON
    rep = json.loads(Path(report).read_text())
    assert rep["total_chunks"] == tr.xcom["rows"]


def test_staged_invocations_shape():
    invs = staged_invocations(
        input_dir="/in", checkpoint_dir="/ck", warehouse="/wh",
        kind="hwp", report_path="/r.json",
    )
    assert [i.stage for i in invs] == [
        "extract", "transform", "load", "validate",
    ]
    for inv in invs:
        assert inv.argv[0] == sys.executable
        assert "--kind" in inv.argv and "hwp" in inv.argv
    assert "--report" in invs[-1].argv


def test_airflow_builders_gated():
    # without airflow the builders must fail with ImportError and nothing
    # else (the plain-subprocess path above is the sandbox contract)
    pytest.importorskip("airflow", reason="airflow not installed")
    from airflow_dags import build_vectordb_etl_dag

    dag = build_vectordb_etl_dag(
        input_dir="/in", checkpoint_dir="/ck", warehouse="/wh"
    )
    assert [t.task_id for t in dag.tasks] == [
        "extract", "transform", "load", "validate",
    ]


@pytest.mark.slow
def test_training_data_prep_composition(spark, docs_tiny, tmp_path):
    # the full prep chain composes: counts are monotone non-increasing
    # through the screens, packs respect the budget, shards are written
    import glob
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "examples"))
    from training_data_prep import prepare_training_data

    from vectordb_etl_spark.store.layout import write_training_shards

    packed, stages = prepare_training_data(
        spark, docs_tiny,
        substring_dup_max_frac=0.95, dsir_target_lang="en",
        dsir_keep_frac=0.9, domain_cap=20,
        mix_targets={"en": 0.6, "zh": 0.4}, budget_tokens=50_000,
        pack_budget=256,
    )
    order = ["input", "length_screened", "boilerplate_screened",
             "substring_screened", "domain_capped", "deduped",
             "quality_gated", "dsir_selected", "mixed", "packed_rows"]
    counts = [stages[s] for s in order if s in stages]
    assert all(a >= b for a, b in zip(counts, counts[1:-1]))
    assert stages["packed_rows"] == stages[order[-2]]  # packing keeps rows
    # every pack respects the budget unless it is a single oversize doc
    per_pack = {}
    for r in packed.select("bucket", "pack_id", "pack_fill", "n_tokens").collect():
        per_pack.setdefault((r["bucket"], r["pack_id"]), []).append(r)
    for members in per_pack.values():
        fill = members[0]["pack_fill"]
        assert fill <= 256 or len(members) == 1
    p = str(tmp_path / "shards")
    write_training_shards(packed, p)
    assert glob.glob(f"{p}/bucket=*/part-*.parquet")
    assert spark.read.parquet(p).count() == stages["packed_rows"]


@pytest.mark.slow
def test_corpus_observability_dashboard(spark):
    """Deterministic sketch dashboard: sections present, integer-typed,
    and byte-identical across two runs."""
    import json
    import subprocess
    import sys as _sys
    from pathlib import Path

    script = Path(__file__).resolve().parent.parent / "examples" / (
        "corpus_observability.py"
    )

    def run():
        p = subprocess.run(
            [_sys.executable, str(script), "/root/testdata/sf0.001"],
            capture_output=True, text=True, timeout=420,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        return [
            json.loads(line)
            for line in p.stdout.splitlines()
            if line.startswith("{")
        ]

    first = run()
    sections = {k for d in first for k in d}
    assert sections == {
        "distinct_users_per_type_hll",
        "shingle_overlap",
        "heavy_hitters_cm",
        "skew_user_id",
    }
    second = run()
    assert first == second  # bit-deterministic dashboard


@pytest.mark.slow
def test_warehouse_health_dashboard(spark):
    """Table-side health dashboard: sections present and byte-identical
    across two runs (every number integer / pinned arithmetic)."""
    import json
    import subprocess
    import sys as _sys
    from pathlib import Path

    script = Path(__file__).resolve().parent.parent / "examples" / (
        "warehouse_health.py"
    )

    def run():
        p = subprocess.run(
            [_sys.executable, str(script), "/root/testdata/sf0.001"],
            capture_output=True, text=True, timeout=420,
        )
        assert p.returncode == 0, p.stderr[-2000:]
        return [
            json.loads(line)
            for line in p.stdout.splitlines()
            if line.startswith("{")
        ]

    first = run()
    sections = {k for d in first for k in d}
    assert sections == {
        "column_profile",
        "price_histogram",
        "price_quantity_corr",
        "daily_trend",
        "snapshot_diff",
        "bloom_file_skipping",
    }
    by_name = {k: v for d in first for k, v in d.items()}
    # skipping actually skips: a point probe touches < half the files
    bf = by_name["bloom_file_skipping"]
    assert bf["n_files"] == 8
    assert bf["candidates_for_min_key"] <= 3
    assert by_name["snapshot_diff"]["removed"] > 0
    assert run() == first  # deterministic end to end
