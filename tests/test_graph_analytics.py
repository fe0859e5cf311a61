"""Fixed-iteration integer PageRank — parity, ranking sanity, guards."""

import duckdb
import pytest
from pyspark.sql import functions as F

from vectordb_etl_spark.operators.graph_analytics import pagerank, pagerank_sql


def _star_edges(spark):
    # hub 0 <-> spokes 1..5, plus a 6-7 pair off to the side (undirected)
    pairs = [(0, i) for i in range(1, 6)] + [(6, 7)]
    both = pairs + [(b, a) for a, b in pairs]
    return spark.createDataFrame(both, ["src", "dst"])


def test_pagerank_matches_duckdb_bit_for_bit(spark):
    e = _star_edges(spark)
    got = sorted(map(tuple, pagerank(e, iterations=5).collect()))
    con = duckdb.connect()
    edges_sql = "SELECT * FROM (VALUES " + ", ".join(
        f"({r['src']}, {r['dst']})" for r in e.collect()
    ) + ") t(src, dst)"
    want = sorted(con.execute(pagerank_sql(edges_sql, iterations=5)).fetchall())
    assert got == want


def test_pagerank_ranks_hub_highest(spark):
    ranks = {
        r["node"]: r["rank_micro"]
        for r in pagerank(_star_edges(spark), iterations=6).collect()
    }
    # hub holds the most mass; spokes are symmetric; the isolated pair
    # settles at the two-cycle fixed point around 1.0
    assert ranks[0] > ranks[1]
    assert len({ranks[i] for i in range(1, 6)}) == 1
    assert ranks[6] == ranks[7]
    assert ranks[0] > ranks[6]


def test_pagerank_mass_roughly_conserved(spark):
    """Integer division only LEAKS mass (never creates it): total stays
    within n·iterations·max_deg micro of n·1e6 and never above."""
    e = _star_edges(spark)
    rows = pagerank(e, iterations=6).collect()
    total = sum(r["rank_micro"] for r in rows)
    n = len(rows)
    assert total <= n * 1_000_000
    assert total >= n * 1_000_000 - n * 6 * 10 * 10


def test_pagerank_rejects_bad_damping(spark):
    e = _star_edges(spark)
    with pytest.raises(ValueError, match="damping_ppm"):
        pagerank(e, damping_ppm=0)
    with pytest.raises(ValueError, match="damping_ppm"):
        pagerank_sql("SELECT 1 AS src, 2 AS dst", damping_ppm=2_000_000)


def test_pagerank_plan_is_join_agg_per_iteration(spark):
    """No Python in the loop; shuffles stay proportional to iteration
    count (2 per round: edge join + dst agg), not to graph size."""
    e = _star_edges(spark)
    out = pagerank(e, iterations=3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_triangle_count_k4_with_noise(spark):
    from vectordb_etl_spark.operators.graph_analytics import triangle_count

    # K4 = 4 triangles; plus a self-loop, a duplicate, and a reversed
    # duplicate that canonicalization must absorb, and a pendant vertex
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    edges = k4 + [(2, 2), (0, 1), (1, 0), (3, 9)]
    df = spark.createDataFrame(edges, ["src", "dst"])
    row = triangle_count(df).first()
    assert row["n_triangles"] == 4
    assert row["n_edges"] == 7  # 6 K4 edges + pendant
    assert row["n_nodes"] == 5


def test_triangle_count_star_has_none(spark):
    from vectordb_etl_spark.operators.graph_analytics import triangle_count

    star = [(0, i) for i in range(1, 30)]
    row = triangle_count(spark.createDataFrame(star, ["src", "dst"])).first()
    assert row["n_triangles"] == 0
    # hub orientation: every edge points hub-ward only when the leaf's
    # (deg, id) rank is lower — wedge count must stay 0, not deg²
    assert row["n_wedges"] == 0
