"""Accuracy bounds for the approximate relational operators — rows-only
queries still need their estimates pinned against exact values."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import relational


def test_approx_count_distinct_within_5pct(spark, sf_dir):
    est = {
        r["event_type"]: r["approx_users"]
        for r in relational.approx_count_distinct_users(spark, sf_dir).collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(est) == set(exact)
    for k, true_n in exact.items():
        assert abs(est[k] - true_n) <= max(0.05 * true_n, 2), (k, est[k], true_n)


def test_approx_percentile_brackets_exact(spark, sf_dir):
    """price_quantiles = approx [p25, p50, p75, p95] of o_totalprice per
    status; each estimate must track the exact percentile within 2%."""
    approx = {
        r["o_orderstatus"]: r["price_quantiles"]
        for r in relational.approx_percentiles(spark, sf_dir).collect()
    }
    exact = {
        r["o_orderstatus"]: r["qs"]
        for r in table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.percentile(
                "o_totalprice",
                F.array(F.lit(0.25), F.lit(0.5), F.lit(0.75), F.lit(0.95)),
            ).alias("qs")
        )
        .collect()
    }
    assert set(approx) == set(exact)
    for status, ex_qs in exact.items():
        got_qs = approx[status]
        assert sorted(got_qs) == list(got_qs), "quantiles must be monotone"
        for got, ex in zip(got_qs, ex_qs):
            assert abs(got - ex) <= 0.02 * ex, (status, got, ex)
