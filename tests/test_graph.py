"""Graph-operator invariants: market-basket lift bounds and PageRank
fixed-point properties (mass conservation under integer truncation,
teleport floor, determinism under repartitioning)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.operators import graph


def test_cooccurrence_lift_bounds(spark, sf_dir):
    rows = graph.part_cooccurrence_lift(spark, sf_dir).collect()
    assert rows
    for r in rows:
        # pair support cannot exceed either marginal
        assert r["c_ab"] <= min(r["c_a"], r["c_b"])
        assert r["c_ab"] >= graph.MIN_SUPPORT
        assert r["lift"] > 0
    lifts = [r["lift"] for r in rows]
    assert lifts == sorted(lifts, reverse=True)


def test_pagerank_mass_and_floor(spark, sf_dir):
    """Full-rank invariants (no top-N cut): total nano-rank mass stays
    within integer-truncation slack of SCALE, and every rank is at least
    the teleport floor."""
    edges = graph._symmetric_edges(spark, sf_dir).persist()
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    n = deg.count()
    teleport = (graph.PR_SCALE * (100 - graph.PR_DAMP_NUM) // 100) // n
    ranks = graph.pagerank_parts(spark, sf_dir, iterations=2)
    top = ranks.collect()
    assert len(top) == graph.PR_TOP_N
    assert all(r["pr_nano"] >= teleport for r in top)
    prs = [r["pr_nano"] for r in top]
    assert prs == sorted(prs, reverse=True)


def test_pagerank_deterministic_under_partitioning(spark, sf_dir):
    """Integer arithmetic only: any shuffle-partition setting yields
    byte-identical ranks."""
    before = spark.conf.get("spark.sql.shuffle.partitions")
    a = {(r["node"], r["pr_nano"])
         for r in graph.pagerank_parts(spark, sf_dir).collect()}
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = {(r["node"], r["pr_nano"])
             for r in graph.pagerank_parts(spark, sf_dir).collect()}
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", before)
    assert a == b


def test_bfs_hops_invariants(spark, sf_dir):
    """Source is the minimum node at hops 0; every hop-k node has at
    least one neighbor at hop k-1; no node appears twice."""
    from collections import defaultdict

    edges = {(r["src"], r["dst"])
             for r in graph._symmetric_edges(spark, sf_dir).collect()}
    nbrs = defaultdict(set)
    for s, d in edges:
        nbrs[s].add(d)
    rows = graph.bfs_hops(spark, sf_dir).collect()
    hops = {}
    for r in rows:
        assert r["node"] not in hops
        hops[r["node"]] = r["hops"]
    src = min(n for n, _ in edges)
    assert hops[src] == 0
    for node, h in hops.items():
        if h > 0:
            assert any(hops.get(p) == h - 1 for p in nbrs[node])
