"""Spark 4 SQL-surface entries (LATERAL, SQL UDFs, collation, XML) —
independent invariants at sf0.001; full oracle parity lives in
tools/check_oracles.py."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import sql_surface


def test_lateral_topk_at_most_two_per_customer(spark, sf_dir):
    out = sql_surface.lateral_topk_orders(spark, sf_dir)
    per_cust = out.groupBy("c_custkey").count().collect()
    assert per_cust, "no BUILDING customers with orders"
    assert all(r["count"] <= 2 for r in per_cust)
    # independently recompute one customer's top-2
    ck = per_cust[0]["c_custkey"]
    got = sorted(
        (r["o_totalprice"], r["o_orderkey"])
        for r in out.filter(F.col("c_custkey") == ck).collect()
    )
    o = table(spark, sf_dir, "orders")
    exp = sorted(
        (r["o_totalprice"], r["o_orderkey"])
        for r in o.filter(F.col("o_custkey") == ck)
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(2)
        .collect()
    )
    assert got == exp


def test_lateral_topk_decorrelates_to_window_group_limit(spark, sf_dir):
    """The LIMIT-in-LATERAL must become a rank-limit window (one shuffle
    of orders), NOT a per-row nested-loop re-execution."""
    plan = (
        sql_surface.lateral_topk_orders(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_sql_udf_aggregate_consistency(spark, sf_dir):
    out = sql_surface.sql_udf_functions(spark, sf_dir).collect()
    o = table(spark, sf_dir, "orders")
    expected_n = o.filter(F.col("o_totalprice") >= 50000.0).count()
    assert sum(r["n_orders"] for r in out) == expected_n
    assert {r["band"] for r in out} <= {"low", "mid", "high"}
    assert all(1 <= r["urgency"] <= 5 for r in out)


def test_sql_udf_inlines_into_plan(spark, sf_dir):
    """SQL UDFs must inline: no Python eval nodes, filter pushed to scan."""
    plan = (
        sql_surface.sql_udf_functions(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "PushedFilters: [IsNotNull(o_totalprice), " in plan or (
        "GreaterThanOrEqual(o_totalprice,50000.0)" in plan
    )


def test_collation_groups_are_case_insensitive(spark, sf_dir):
    out = sql_surface.collation_group(spark, sf_dir).collect()
    keys = [r["type_lc"] for r in out]
    assert keys, "no groups"
    assert all(k == k.lower() for k in keys)
    assert len(keys) == len(set(keys)), "collated grouping left case-dup keys"
    assert "standard" not in keys, "collated filter failed to drop STANDARD"
    p = table(spark, sf_dir, "part")
    expected_n = p.filter(F.lower("p_type") != "standard").count()
    assert sum(r["n_parts"] for r in out) == expected_n


def test_xml_roundtrip_identity(spark, sf_dir):
    out = sql_surface.xml_functions(spark, sf_dir)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderstatus").alias("exp_status"),
        F.col("o_orderpriority").alias("exp_priority"),
    )
    joined = out.join(o, "o_orderkey")
    bad = joined.filter(
        (F.col("rt_status") != F.col("exp_status"))
        | (F.col("rt_priority") != F.col("exp_priority"))
        | (F.col("xp_sum") != F.col("o_orderkey") * 2 + 1)
    ).count()
    assert bad == 0
    assert joined.count() == table(spark, sf_dir, "orders").count()


def test_sql_scripting_threshold_converges(spark, sf_dir):
    """The WHILE loop must stop at the first threshold below the 25%
    fraction — recompute the ladder driver-side and compare."""
    out = sql_surface.sql_scripting_threshold(spark, sf_dir).collect()
    assert out, "empty scripting result"
    thr = {r["threshold"] for r in out}
    assert len(thr) == 1
    thr = thr.pop()
    o = table(spark, sf_dir, "orders")
    total = o.count()
    t = 50000.0
    while o.filter(F.col("o_totalprice") > t).count() >= 0.25 * total:
        t *= 2
    assert thr == t
    assert sum(r["n_orders"] for r in out) == o.filter(
        F.col("o_totalprice") > t
    ).count()
