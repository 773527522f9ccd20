"""Accuracy bounds for the approximate relational operators — rows-only
queries still need their estimates pinned against exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import relational


def test_approx_count_distinct_bound_holds(spark, sf_dir):
    """The engine-side bound column must be true everywhere and the exact
    counts must match an independent countDistinct."""
    rows = relational.approx_count_distinct_users(spark, sf_dir).collect()
    assert rows
    exact = {
        r["event_type"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"]: r["exact_users"] for r in rows} == exact
    assert all(r["approx_ok"] for r in rows), [
        r["event_type"] for r in rows if not r["approx_ok"]
    ]


def test_approx_percentile_brackets_exact(spark, sf_dir):
    """Every engine-side quantile bound (approx within 1% of the exact
    percentile) must hold for every order status."""
    rows = relational.approx_percentiles(spark, sf_dir).collect()
    assert rows
    for r in rows:
        for q in ("q25_ok", "q50_ok", "q75_ok", "q95_ok"):
            assert r[q], (r["o_orderstatus"], q)
