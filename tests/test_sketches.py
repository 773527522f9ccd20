"""Sketch accuracy: HLL estimates must track exact distinct counts."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import sketches


def test_hll_estimates_within_bound(spark, sf_dir):
    rows = sketches.hll_sketch_users(spark, sf_dir).collect()
    e = table(spark, sf_dir, "events")
    exact = {
        r["event_type"]: r["n"]
        for r in e.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    exact["ALL"] = e.select("user_id").distinct().count()
    assert {r["event_type"]: r["exact_users"] for r in rows} == exact
    assert all(r["est_ok"] for r in rows), [
        r["event_type"] for r in rows if not r["est_ok"]
    ]


def test_heavy_hitters_threshold(spark, sf_dir):
    rows = sketches.heavy_hitters_terms(spark, sf_dir).collect()
    assert rows, "common stopwords should exceed 2000 ppm"
    assert all(r["ppm"] >= 2000 for r in rows)


def test_approx_topk_terms_matches_exact_ladder(spark, sf_dir):
    from airflow_postgres_to_s3_pipeline_spark.operators.sketches import (
        APPROX_TOPK_K, approx_topk_terms,
    )

    out = sorted(
        approx_topk_terms(spark, sf_dir).collect(), key=lambda r: r["rnk"]
    )
    assert len(out) == APPROX_TOPK_K
    assert all(r["count_exact"] for r in out), (
        "sketch count diverged from exact while tracking whole vocabulary"
    )
    counts = [r["approx_count"] for r in out]
    assert counts == sorted(counts, reverse=True)
