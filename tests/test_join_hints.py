"""Join-strategy hints: the physical-plan steering levers a 100 TB job
needs when Catalyst's size estimates are wrong.

Each test pins that the hint actually lands in the physical plan:

- broadcast: force a map-side join for a side the optimizer thinks is too
  big (stats missing/stale is the common production cause).
- shuffle_hash: build a hash table per partition instead of sorting both
  sides — wins when one side is much smaller but still above the
  broadcast threshold (skips two sorts).
- merge: force sort-merge — the safe choice when both sides are huge and
  neither fits a hash table in executor memory.
- shuffle_replicate_nl and the no-hint default round out the matrix.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.plans import explain_str


def _sides(spark, sf_dir):
    orders = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    lineitem = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    return orders, lineitem


def test_merge_hint_forces_sort_merge(spark, sf_dir):
    orders, lineitem = _sides(spark, sf_dir)
    df = lineitem.join(
        orders.hint("merge"), lineitem.l_orderkey == orders.o_orderkey
    )
    plan = explain_str(df, "simple")
    assert "SortMergeJoin" in plan, plan


def test_shuffle_hash_hint_forces_hash_join(spark, sf_dir):
    orders, lineitem = _sides(spark, sf_dir)
    df = lineitem.join(
        orders.hint("shuffle_hash"), lineitem.l_orderkey == orders.o_orderkey
    )
    plan = explain_str(df, "simple")
    assert "ShuffledHashJoin" in plan, plan
    assert "SortMergeJoin" not in plan, plan


def test_broadcast_hint_overrides_threshold(spark, sf_dir):
    """Force a broadcast even when autoBroadcastJoinThreshold would say
    no — the stale-stats escape hatch."""
    orders, lineitem = _sides(spark, sf_dir)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        df = lineitem.join(
            F.broadcast(orders), lineitem.l_orderkey == orders.o_orderkey
        )
        plan = explain_str(df, "simple")
        assert "BroadcastHashJoin" in plan, plan
        # and without the hint, -1 threshold means NO broadcast
        df2 = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
        plan2 = explain_str(df2, "simple")
        assert "BroadcastHashJoin" not in plan2, plan2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_hint_survives_catalyst_rewrites(spark, sf_dir):
    """The hint must stick through filter pushdown and column pruning —
    a hint that detaches under rewrites is useless in a real pipeline."""
    orders, lineitem = _sides(spark, sf_dir)
    df = (
        lineitem.join(
            orders.hint("shuffle_hash"),
            lineitem.l_orderkey == orders.o_orderkey,
        )
        .filter(F.col("l_quantity") > 40)
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = explain_str(df, "simple")
    assert "ShuffledHashJoin" in plan, plan


def test_sql_hint_syntax(spark, sf_dir):
    """SELECT /*+ SHUFFLE_MERGE(l) */ — the SQL-surface form."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("h_orders")
    table(spark, sf_dir, "lineitem").createOrReplaceTempView("h_lineitem")
    plan = explain_str(
        spark.sql(
            """
            SELECT /*+ SHUFFLE_MERGE(l) */ o.o_custkey, l.l_quantity
            FROM h_lineitem l JOIN h_orders o ON l.l_orderkey = o.o_orderkey
            """
        ),
        "simple",
    )
    assert "SortMergeJoin" in plan, plan
