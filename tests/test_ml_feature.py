"""pyspark.ml tier: behavior pinned against the custom implementations."""

from __future__ import annotations

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import dedup, ml_feature


def test_tfidf_ml_shapes(spark, sf_dir):
    out = ml_feature.tfidf_ml_features(spark, sf_dir).collect()
    assert len(out) == table(spark, sf_dir, "documents").count()
    for r in out:
        assert r["buckets_within_bound"] is True
        assert r["weight_nonneg"] is True
        assert 1 <= r["n_distinct_tokens"] <= r["n_tokens"]


def test_minhash_ml_finds_custom_pipeline_pairs(spark, sf_dir):
    """Every high-confidence pair from the custom MinHash pipeline must be
    found by the ml MinHashLSH variant (both see exact Jaccard >= 0.6 after
    their respective candidate generation)."""
    custom = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            table(spark, sf_dir, "documents"), threshold=0.8
        ).collect()
    }
    ml = {
        (r["doc_a"], r["doc_b"])
        for r in ml_feature.minhash_ml_pairs(spark, sf_dir, threshold=0.6).collect()
    }
    # ml candidate generation is probabilistic too; demand the
    # high-similarity core is recovered
    missing = custom - ml
    assert not missing, f"ml variant missed high-sim pairs: {missing}"
