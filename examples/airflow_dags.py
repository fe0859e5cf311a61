"""Scheduler-orchestration parity: the reference's two Airflow DAGs
re-expressed for the Spark engine (reference dags/vectordb_etl_dag.py:265-318
and dags/hwp_etl_dag.py:159-231).

The reference runs extract → transform → load → validate → notify as Airflow
PythonOperators, one PROCESS per task, passing pickle-file paths between
tasks via XCom (dags/vectordb_etl_dag.py:80-81, 98-104, 125-126, 141-147)
and summary scalars via XCom values (231-249). Here each task shells out to
the engine's CLI (``python -m vectordb_etl_spark --stage <s>``) — the
spark-submit-per-stage pattern — and the XCom payload is the **parquet
checkpoint path** printed on the stage's JSON line. The stage contract is a
directory either way; parquet replaces pickle (columnar, splittable,
predicate-pushdown-friendly for the next stage's scan).

Two entry points:

- :func:`build_vectordb_etl_dag` — the HTML pipeline DAG
  (@daily, retries=1/5 min, 2 h timeout: dags/vectordb_etl_dag.py:38-46,269).
- :func:`build_hwp_etl_dag` — the HWP variant with the per-folder
  ``hwp_<folder>`` collection load loop (dags/hwp_etl_dag.py:159-231, name
  rule at 198). The reference's load task has a constructor-signature bug
  (hwp_etl_dag.py:204-207 passes kwargs ``MilvusVectorStore`` does not
  accept — it would raise TypeError on first run); this module implements
  the *intended* behavior (main.py:396-402), not the bug.

Airflow itself is OPTIONAL: when it is importable the builders return real
``DAG`` objects; without it, :func:`run_staged_pipeline` executes the same
task sequence as plain subprocesses — which is also what the parity test
exercises (tests/test_examples.py), so the orchestration contract stays
covered in environments without a scheduler.
"""

from __future__ import annotations

import json
import subprocess
import sys
from dataclasses import dataclass, field


@dataclass
class StageInvocation:
    """One orchestrator task = one CLI process. ``xcom`` is what the task
    pushes: the stage's checkpoint path plus summary scalars."""

    stage: str
    argv: list[str]
    xcom: dict = field(default_factory=dict)


def _cli_argv(
    stage: str,
    *,
    input_dir: str,
    checkpoint_dir: str,
    warehouse: str,
    kind: str = "html",
    dimension: int = 64,
    master: str = "local[4]",
    extra: list[str] | None = None,
) -> list[str]:
    argv = [
        sys.executable, "-m", "vectordb_etl_spark",
        "--stage", stage,
        "--kind", kind,
        "--input-dir", input_dir,
        "--checkpoint-dir", checkpoint_dir,
        "--warehouse", warehouse,
        "--dimension", str(dimension),
        "--master", master,
    ]
    return argv + (extra or [])


def run_stage(inv: StageInvocation, timeout: int = 7200) -> StageInvocation:
    """Run one stage process; parse its JSON line(s) into the XCom payload.
    ``timeout`` mirrors the reference's 2 h execution_timeout
    (dags/vectordb_etl_dag.py:44)."""
    proc = subprocess.run(
        inv.argv, capture_output=True, text=True, timeout=timeout, check=True
    )
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                inv.xcom.update(json.loads(line))
            except json.JSONDecodeError:
                continue
    return inv


def staged_invocations(
    *,
    input_dir: str,
    checkpoint_dir: str,
    warehouse: str,
    kind: str = "html",
    dimension: int = 64,
    master: str = "local[4]",
    report_path: str | None = None,
) -> list[StageInvocation]:
    """The task chain of dags/vectordb_etl_dag.py:318 (start→extract→
    transform→load→validate), one CLI process each. The notify task is the
    caller reading the final XComs (the reference just aggregates XCom
    scalars into a message, vectordb_etl_dag.py:231-249)."""
    common = dict(
        input_dir=input_dir, checkpoint_dir=checkpoint_dir,
        warehouse=warehouse, kind=kind, dimension=dimension, master=master,
    )
    stages = ["extract", "transform", "load", "validate"]
    invs = []
    for s in stages:
        extra = (
            ["--report", report_path]
            if s == "validate" and report_path
            else None
        )
        invs.append(StageInvocation(s, _cli_argv(s, extra=extra, **common)))
    return invs


def run_staged_pipeline(**kwargs) -> list[StageInvocation]:
    """Scheduler-free twin of the DAG: run the chain sequentially, passing
    nothing between processes except what's on disk at the checkpoint paths
    — proving the stage contract is really path-only (any orchestrator that
    can run four shell commands in order can run this pipeline)."""
    out = []
    for inv in staged_invocations(**kwargs):
        out.append(run_stage(inv))
    return out


# ---------------------------------------------------------------------------
# Airflow builders (import-gated; the sandbox has no airflow)
# ---------------------------------------------------------------------------


def build_vectordb_etl_dag(
    *,
    dag_id: str = "vectordb_etl_pipeline",
    schedule: str = "@daily",
    **pipeline_kwargs,
):
    """Reference dags/vectordb_etl_dag.py:265-318 — @daily, retries=1 with
    5 min delay, 2 h timeout (default_args at 38-46). Each task pushes its
    stage JSON (path + rows) to XCom; downstream tasks only need the path,
    which they read from disk state, so tasks stay restartable."""
    from datetime import timedelta

    from airflow import DAG  # type: ignore[import-not-found]
    from airflow.operators.python import PythonOperator  # type: ignore[import-not-found]

    default_args = {
        "retries": 1,
        "retry_delay": timedelta(minutes=5),
        "execution_timeout": timedelta(hours=2),
    }
    dag = DAG(dag_id, schedule=schedule, default_args=default_args, catchup=False)
    prev = None
    for inv in staged_invocations(**pipeline_kwargs):
        task = PythonOperator(
            task_id=inv.stage,
            python_callable=lambda inv=inv: run_stage(inv).xcom,
            dag=dag,
        )
        if prev is not None:
            prev >> task
        prev = task
    return dag


def build_hwp_etl_dag(
    *,
    folders: list[str],
    dag_id: str = "hwp_etl_pipeline",
    schedule: str = "@daily",
    input_dir: str,
    checkpoint_dir: str,
    warehouse: str,
    **cli_kwargs,
):
    """Reference dags/hwp_etl_dag.py — the HWP variant: shared extract +
    transform, then ONE LOAD TASK PER SOURCE FOLDER creating/filling
    ``hwp_<folder>`` collections (hwp_etl_dag.py:159-231; naming rule at
    198). Folder fan-out is where the two reference DAGs genuinely differ;
    in the Spark engine a per-folder load is simply the shared load (the
    collection column partitions by folder already), so per-folder tasks
    become per-folder VALIDATION scoped by collection — preserving the
    reference's per-folder observability without re-running the writer N
    times. The reference's load-task constructor bug (204-207) is
    deliberately not reproduced."""
    from airflow import DAG  # type: ignore[import-not-found]
    from airflow.operators.python import PythonOperator  # type: ignore[import-not-found]

    dag = DAG(dag_id, schedule=schedule, catchup=False)
    common = dict(
        input_dir=input_dir, checkpoint_dir=checkpoint_dir,
        warehouse=warehouse, kind="hwp", **cli_kwargs,
    )
    chain = staged_invocations(**common)
    tasks = {}
    prev = None
    for inv in chain:
        t = PythonOperator(
            task_id=inv.stage,
            python_callable=lambda inv=inv: run_stage(inv).xcom,
            dag=dag,
        )
        if prev is not None:
            prev >> t
        tasks[inv.stage] = t
        prev = t

    def _folder_stats(folder: str) -> dict:
        from vectordb_etl_spark.config import PipelineConfig, StoreConfig
        from vectordb_etl_spark.session import get_spark
        from vectordb_etl_spark.store.collections import CollectionStore

        spark = get_spark(f"hwp-validate-{folder}")
        store = CollectionStore(
            spark,
            StoreConfig(warehouse_dir=warehouse, collection_prefix="hwp"),
        )
        name = f"hwp_{folder}"  # naming rule, hwp_etl_dag.py:198
        return {"collection": name, "rows": store.read(name).count()}

    for folder in folders:
        t = PythonOperator(
            task_id=f"validate_hwp_{folder}",
            python_callable=lambda folder=folder: _folder_stats(folder),
            dag=dag,
        )
        tasks["load"] >> t
    return dag
