"""Dedup operators against planted duplicates (the testdata has its own
near-dups, but planting makes recall assertions deterministic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.operators import dedup

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the garden trees"
)
NEAR = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill and the birds sing in the green trees"
)
OTHER = (
    "spark executes distributed dataframe plans with catalyst optimizing "
    "joins aggregations and shuffles across many cluster executor nodes"
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, BASE), (3, NEAR), (4, OTHER)], ["doc_id", "text"]
    )


def test_minhash_lsh_finds_planted_pairs(spark):
    pairs = dedup.minhash_lsh_pairs(_docs(spark), threshold=0.5)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got  # exact dup: jaccard 1.0, must always collide
    assert (1, 3) in got or (2, 3) in got  # near dup
    assert all(4 not in p for p in got)  # unrelated doc never pairs


def test_minhash_exact_dup_jaccard_is_one(spark):
    pairs = dedup.minhash_lsh_pairs(_docs(spark), threshold=0.5)
    j = {(r["doc_a"], r["doc_b"]): r["jaccard"] for r in pairs.collect()}
    assert j[(1, 2)] == 1.0


def test_simhash_near_pairs(spark):
    pairs = dedup.simhash_near_pairs(_docs(spark), max_hamming=10)
    got = {(r["doc_a"], r["doc_b"]) for r in pairs.collect()}
    assert (1, 2) in got
    hamming = {(r["doc_a"], r["doc_b"]): r["hamming"] for r in pairs.collect()}
    assert hamming[(1, 2)] == 0  # identical text -> identical simhash
    assert all(4 not in p for p in got)


def test_shingle_arrays_row_local(spark):
    sh = dedup.shingle_arrays(spark.createDataFrame([(1, "a b c d")], ["doc_id", "text"]))
    got = sh.collect()[0]["shingles"]
    assert sorted(got) == ["a b c", "b c d"]


def test_dedup_exact_collapses_copies(spark, sf_dir):
    out = dedup.dedup_exact(spark, sf_dir)
    total_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    # groups sum back to total; each group keeps its min doc_id
    agg = out.agg(F.sum("n_copies").alias("s")).collect()[0]["s"]
    assert agg == total_docs


def test_connected_components_unconverged_raises(spark):
    """A chain longer than the iteration budget must NOT silently
    under-merge: default behavior raises, warn-mode returns partial labels
    with a RuntimeWarning."""
    import warnings

    import pytest

    chain = [(i, i + 1) for i in range(12)]  # diameter 12 path graph
    pairs = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    nodes = spark.createDataFrame([(i,) for i in range(13)], ["doc_id"])
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup.connected_components(pairs, nodes, max_iterations=2)
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        labels = dedup.connected_components(
            pairs, nodes, max_iterations=2, on_unconverged="warn"
        )
        labels.collect()
    assert any("did not converge" in str(w.message) for w in caught)


def test_connected_components_converged_within_budget(spark):
    """A chain whose diameter fits the budget converges: every node lands
    in one cluster labeled by the min doc_id, with no warning/raise."""
    chain = [(i, i + 1) for i in range(5)]
    pairs = spark.createDataFrame(chain, ["doc_a", "doc_b"])
    nodes = spark.createDataFrame([(i,) for i in range(6)], ["doc_id"])
    labels = dedup.connected_components(pairs, nodes, max_iterations=6)
    assert {r["cluster_id"] for r in labels.collect()} == {0}
