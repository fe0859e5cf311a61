"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() align."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_entry_runs(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 0
    assert "score" in df.columns


def test_queries_and_oracles_align(spark):
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 20


def test_each_query_returns_dataframe(spark):
    qs = entrymod.queries()
    sf = "/root/testdata/sf0.001"
    for name in ("clean_text", "vector_topk", "pricing_summary"):
        df = qs[name](spark, sf)
        assert df.count() > 0, name
