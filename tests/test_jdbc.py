"""Genuine JDBC round-trip over the embedded Derby driver bundled with
Spark — the reference's Postgres warehouse boundary (SURVEY.md §2A L1, §2B
E1) exercised end-to-end without an external database."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.sources import readers


def test_jdbc_write_read_roundtrip(spark, sf_dir, tmp_path):
    url = f"jdbc:derby:{os.path.join(str(tmp_path), 'wh')};create=true"
    src = (
        table(spark, sf_dir, "nation")
        .select("n_nationkey", "n_name", "n_regionkey")
    )
    readers.write_jdbc(
        src, url, "nation_wh", mode="overwrite",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    back = readers.read_jdbc(
        spark, url, "nation_wh",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_jdbc_partitioned_read_and_pushdown(spark, sf_dir, tmp_path):
    """Partitioned JDBC read (4 parallel range queries) + filter pushdown
    into the remote SQL."""
    url = f"jdbc:derby:{os.path.join(str(tmp_path), 'wh2')};create=true"
    src = table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_acctbal"
    )
    readers.write_jdbc(
        src, url, "customer_wh", mode="overwrite",
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    hi = src.agg(F.max("c_custkey")).collect()[0][0]
    back = readers.read_jdbc(
        spark, url, "customer_wh",
        partition_column="c_custkey", lower_bound=0, upper_bound=int(hi) + 1,
        num_partitions=4,
        driver="org.apache.derby.jdbc.EmbeddedDriver",
    )
    assert back.rdd.getNumPartitions() == 4
    filtered = back.filter(F.col("c_nationkey") == 3)
    plan = filtered._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "PushedFilters" in plan and "c_nationkey" in plan.split("PushedFilters")[1][:200]
    expected = src.filter(F.col("c_nationkey") == 3).count()
    assert filtered.count() == expected
