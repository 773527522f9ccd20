"""Relational-core spot checks at sf0.001 (full oracle coverage lives in
tools/check_oracles.py; these pin a few independent invariants)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import relational


def test_pricing_summary_totals(spark, sf_dir):
    out = relational.pricing_summary(spark, sf_dir)
    total = out.agg(F.sum("count_order").alias("n")).collect()[0]["n"]
    expected = (
        table(spark, sf_dir, "lineitem")
        .filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .count()
    )
    assert total == expected


def test_semi_plus_anti_partitions_customers(spark, sf_dir):
    """left_semi(orders) + left_anti(orders) must partition customer."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").count()
    anti = relational.join_anti(spark, sf_dir).count()
    assert semi + anti == c.count()


def test_global_topk_descending(spark, sf_dir):
    prices = [r["o_totalprice"] for r in relational.global_topk(spark, sf_dir).collect()]
    assert prices == sorted(prices, reverse=True)
    assert len(prices) == 10


def test_rollup_grand_total_row(spark, sf_dir):
    out = relational.rollup_acctbal(spark, sf_dir)
    grand = out.filter(
        F.col("n_name").isNull() & F.col("c_mktsegment").isNull()
    ).collect()
    assert len(grand) == 1
    assert grand[0]["n_customers"] == table(spark, sf_dir, "customer").count()


def test_set_operations_consistency(spark, sf_dir):
    rows = relational.set_operations(spark, sf_dir).collect()
    ops = {}
    for r in rows:
        ops.setdefault(r["op"], set()).add(r["c_custkey"])
    # union ⊇ intersect, except = union-side minus the other set
    assert ops.get("intersect", set()) <= ops["union"]
    assert ops.get("except", set()).isdisjoint(ops.get("intersect", set()))
