"""Snapshot log — time travel, rollback, concurrency, vacuum."""

import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.store.snapshots import SnapshotStore


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(F.col("id").alias("v"))


def test_append_overwrite_time_travel_and_rollback(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "tbl"))
    v0 = st.append(_df(spark, 0, 10), note="first")
    v1 = st.append(_df(spark, 10, 15), note="second")
    assert (v0, v1) == (0, 1)
    assert st.read().count() == 15
    # time travel: version 0 still reads the original 10 rows AFTER later
    # commits
    assert st.read(version=0).count() == 10
    v2 = st.overwrite(_df(spark, 100, 103), note="replace")
    assert st.read().count() == 3
    assert st.read(version=v1).count() == 15  # history intact
    # rollback commits a NEW version with v1's files
    v3 = st.rollback(v1)
    assert v3 == 3 and st.read().count() == 15
    assert st.versions() == [0, 1, 2, 3]
    assert sorted(r["v"] for r in st.read().collect()) == list(range(15))
    assert sorted(r["v"] for r in st.read(version=v2).collect()) == [
        100, 101, 102,
    ]


def test_read_errors(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "tbl"))
    with pytest.raises(ValueError, match="no commits"):
        st.read()
    st.append(_df(spark, 0, 5))
    with pytest.raises(ValueError, match="unknown version"):
        st.read(version=7)


def test_commit_race_retries_to_next_version(spark, tmp_path):
    """Optimistic concurrency: if the next version number is taken
    between log read and publish, the commit lands on the following
    number instead of clobbering."""
    st = SnapshotStore(spark, str(tmp_path / "tbl"))
    st.append(_df(spark, 0, 5))
    # simulate a racing writer owning version 1 with an EMPTY overwrite
    squatter = {"version": 1, "files": [], "n_rows": 0, "note": "race"}
    assert st._try_commit(1, squatter)
    v = st.append(_df(spark, 5, 8))
    assert v == 2
    # append REBASES on the latest committed state (the squatter's empty
    # table), so the new version holds exactly the appended 3 rows — the
    # squatter's commit is respected, not clobbered
    assert st.read(version=2).count() == 3
    assert st.read(version=0).count() == 5  # and history is intact
    # _try_commit refuses to overwrite an existing version
    assert not st._try_commit(1, squatter)


def test_vacuum_keeps_referenced_files_only(spark, tmp_path):
    st = SnapshotStore(spark, str(tmp_path / "tbl"))
    st.append(_df(spark, 0, 10))
    st.overwrite(_df(spark, 50, 60))
    # both versions referenced -> nothing to vacuum
    assert st.vacuum() == []
    assert st.read(version=0).count() == 10
    # drop version-0's manifest (retention policy) -> its files become dead
    st._fs.delete(st._jvm_path(f"{st.root}/_log/0.json"), False)
    # default grace window protects just-written dirs (an in-flight commit
    # writes files before it publishes the manifest) — nothing deleted yet
    assert st.vacuum() == []
    deleted = st.vacuum(grace_s=0)
    assert deleted, "expected the unreferenced commit dir to be deleted"
    assert st.read().count() == 10  # latest still intact


def test_append_race_does_not_lose_rows(spark, tmp_path):
    """The retry path re-reads the log, so a commit that lost the rename
    race still chains off the version list it re-reads — but note the
    manifest it retries with was built from the PRE-race base."""
    st = SnapshotStore(spark, str(tmp_path / "tbl"))
    st.append(_df(spark, 0, 5))
    before = st.read().count()
    st.append(_df(spark, 5, 9))
    assert st.read().count() == before + 4


def test_table_diff_classifies_all_four(spark):
    from vectordb_etl_spark.store.snapshots import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k bigint, s string, v bigint",
    )
    new = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 20), (4, None, 40), (5, "e", 50)],
        "k bigint, s string, v bigint",
    )
    got = {r["k"]: r["change_type"] for r in table_diff(old, new, ["k"]).collect()}
    # 4 has NULL s on both sides: null-safe compare -> unchanged
    assert got == {
        1: "unchanged",
        2: "changed",
        3: "removed",
        4: "unchanged",
        5: "added",
    }


def test_table_diff_respects_compare_cols_subset(spark):
    from vectordb_etl_spark.store.snapshots import table_diff

    old = spark.createDataFrame([(1, "a", 10)], "k bigint, s string, v bigint")
    new = spark.createDataFrame([(1, "a", 99)], "k bigint, s string, v bigint")
    only_s = table_diff(old, new, ["k"], compare_cols=["s"]).first()
    assert only_s["change_type"] == "unchanged"
    full = table_diff(old, new, ["k"]).first()
    assert full["change_type"] == "changed"


def test_table_diff_guards(spark):
    import pytest as _pt

    from vectordb_etl_spark.store.snapshots import table_diff

    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    with _pt.raises(ValueError, match="key_cols"):
        table_diff(df, df, [])
    with _pt.raises(ValueError, match="missing"):
        table_diff(df, df, ["k"], compare_cols=["nope"])


def test_table_diff_plan_single_join_no_python(spark):
    from vectordb_etl_spark.store.snapshots import table_diff

    df = spark.createDataFrame([(i, f"s{i}") for i in range(100)], "k bigint, s string")
    plan = (
        table_diff(df, df, ["k"])
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("SortMergeJoin") + plan.count("BroadcastHashJoin") + plan.count("ShuffledHashJoin") == 1
    assert "BatchEvalPython" not in plan


def test_vacuum_skewed_writer_clock_protected_by_fs_mtime(spark, tmp_path):
    """A writer whose clock runs far BEHIND names its commit dir with an
    old time_ns; the vacuuming process's local filesystem nonetheless
    just saw the directory appear. The grace window must honor the fs
    mtime (ADVICE r07) — deleting on the name alone would destroy an
    in-flight commit's only copy of its files."""
    st = SnapshotStore(spark, str(tmp_path / "tbl"))
    st.append(_df(spark, 0, 10))
    # simulate a skewed writer: an unreferenced commit dir whose NAME
    # says it is an hour old, but which was created on disk just now
    import time

    skew_ns = time.time_ns() - 3_600 * 10**9
    stale_named = f"{st.root}/files/c-{skew_ns}-deadbeef"
    fs = st._fs
    fs.mkdirs(st._jvm_path(stale_named))
    _df(spark, 90, 95).coalesce(1).write.mode("overwrite").parquet(
        f"{stale_named}/part"
    )
    # name-encoded age is past any sane grace window, fs mtime is fresh:
    # the default grace must SKIP it
    assert st.vacuum() == []
    assert fs.exists(st._jvm_path(stale_named))
    # once genuinely old by both clocks (grace 0), it is collectible
    assert st.vacuum(grace_s=0)
    assert not fs.exists(st._jvm_path(stale_named))
