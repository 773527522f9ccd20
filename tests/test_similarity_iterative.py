"""Invariants for the iterative DataFrame algorithms: k-means and
connected-components dedup clustering."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import dedup, similarity


def test_kmeans_partitions_corpus(spark, sf_dir):
    out = similarity.kmeans_embeddings(spark, sf_dir, k=8, iterations=2).collect()
    n_total = table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in out) == n_total
    assert 1 <= len(out) <= 8
    assert all(r["avg_sq_dist"] >= 0 for r in out)


def test_kmeans_improves_or_holds(spark, sf_dir):
    """More Lloyd iterations must not increase total within-cluster SSE."""

    def sse(iters: int) -> float:
        rows = similarity.kmeans_embeddings(
            spark, sf_dir, k=8, iterations=iters
        ).collect()
        return sum(r["avg_sq_dist"] * r["n_vectors"] for r in rows)

    assert sse(3) <= sse(1) + 1e-6


def test_connected_components_matches_union_find(spark, sf_dir):
    """Min-label propagation must equal a driver-side union-find."""
    d = table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(d).select("doc_a", "doc_b")
    edge_rows = [(r["doc_a"], r["doc_b"]) for r in pairs.collect()]
    ids = [r["doc_id"] for r in d.select("doc_id").collect()]

    parent = {i: i for i in ids}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    expected = {}
    for i in ids:
        expected.setdefault(find(i), set()).add(i)

    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup.connected_components(pairs, d.select("doc_id")).collect()
    }
    for root, members in expected.items():
        canonical = min(members)
        for m in members:
            assert got[m] == canonical, (m, got[m], canonical)


def test_dedup_components_counts(spark, sf_dir):
    out = dedup.dedup_components(spark, sf_dir).collect()
    for r in out:
        assert r["n_duplicates"] >= 1
