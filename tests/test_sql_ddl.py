"""SQL DDL surface (SURVEY.md §2A D1): managed partitioned tables created
and loaded via spark.sql, with partition pruning verified on the read path —
the reference's CREATE TABLE + batch-predicate export, warehouse-native."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.plans import explain_str


def test_partitioned_table_ddl_and_pruning(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS orders_wh")
    try:
        spark.sql(
            """
            CREATE TABLE orders_wh (
                o_orderkey BIGINT, o_custkey BIGINT, o_orderstatus STRING,
                o_totalprice DOUBLE, o_orderpriority STRING, order_year INT
            ) USING parquet PARTITIONED BY (order_year)
            """
        )
        o = table(spark, sf_dir, "orders").withColumn(
            "order_year", F.year("o_orderdate")
        ).drop("o_orderdate")
        o.write.mode("overwrite").insertInto("orders_wh")

        # the reference's export predicate shape -> partition pruning
        pruned = spark.sql("SELECT * FROM orders_wh WHERE order_year = 1995")
        plan = explain_str(pruned)
        assert "order_year" in plan and (
            "PartitionFilters" in plan or "partition filters" in plan.lower()
        )
        expected = o.filter(F.col("order_year") == 1995).count()
        assert pruned.count() == expected

        # idempotent batch reload: dynamic overwrite of one partition only
        total_before = spark.table("orders_wh").count()
        o.filter(F.col("order_year") == 1995).write.mode(
            "overwrite"
        ).insertInto("orders_wh")
        assert spark.table("orders_wh").count() == total_before
    finally:
        spark.sql("DROP TABLE IF EXISTS orders_wh")


def test_ctas_and_insert_select(spark, sf_dir):
    spark.sql("DROP TABLE IF EXISTS status_summary")
    try:
        table(spark, sf_dir, "orders").createOrReplaceTempView("orders_v")
        spark.sql(
            """
            CREATE TABLE status_summary USING parquet AS
            SELECT o_orderstatus, COUNT(*) AS n FROM orders_v
            GROUP BY o_orderstatus
            """
        )
        first = {
            r["o_orderstatus"]: r["n"]
            for r in spark.table("status_summary").collect()
        }
        spark.sql(
            "INSERT INTO status_summary SELECT 'X' AS o_orderstatus, 0 AS n"
        )
        after = spark.table("status_summary").count()
        assert after == len(first) + 1
    finally:
        spark.sql("DROP TABLE IF EXISTS status_summary")
