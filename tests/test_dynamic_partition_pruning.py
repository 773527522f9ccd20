"""Dynamic partition pruning: a join against a filtered dimension must
prune fact partitions at RUNTIME (the subquery-broadcast mechanism that
turns star-schema joins into partial scans at 100 TB)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.plans import explain_str


def test_dpp_prunes_fact_partitions(spark, sf_dir, tmp_path):
    fact_path = os.path.join(str(tmp_path), "orders_by_year")
    o = table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    o.write.mode("overwrite").partitionBy("order_year").parquet(fact_path)
    years = [r["order_year"] for r in o.select("order_year").distinct().collect()]
    assert len(years) > 3, "need multiple partitions for pruning to matter"

    fact = spark.read.parquet(fact_path)
    dim = spark.createDataFrame(
        [(y, f"label-{y}") for y in years], "order_year int, label string"
    )
    picked = min(years)
    joined = fact.join(dim.filter(F.col("label") == f"label-{picked}"), "order_year")

    plan = explain_str(joined)
    assert "dynamicpruning" in plan.lower(), plan[:1500]

    expected = o.filter(F.col("order_year") == picked).count()
    assert joined.count() == expected
