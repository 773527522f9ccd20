"""Bucketed-join plans, skew-safe operators, and stateful streaming."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import skew
from airflow_postgres_to_s3_pipeline_spark.plans import explain_str
from airflow_postgres_to_s3_pipeline_spark.sources import sinks


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path):
    """Two tables bucketed on the join key must join without a shuffle."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        o = table(spark, sf_dir, "orders")
        c = table(spark, sf_dir, "customer")
        sinks.write_bucketed_table(o, "b_orders", "o_custkey", 8)
        sinks.write_bucketed_table(c, "b_customer", "c_custkey", 8)
        bo = spark.table("b_orders")
        bc = spark.table("b_customer")
        joined = bo.join(bc, bo.o_custkey == bc.c_custkey)
        plan = explain_str(joined, "simple")
        assert "Exchange" not in plan, plan
        # and it still computes the right thing
        assert joined.count() == o.join(c, o.o_custkey == c.c_custkey).count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_customer")


def test_partitioned_write_dynamic_overwrite(spark, sf_dir, tmp_path):
    out = os.path.join(str(tmp_path), "part_orders")
    o = table(spark, sf_dir, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    sinks.write_partitioned(o, out, ["order_year"])
    first = spark.read.parquet(out).count()
    # overwrite one partition's worth: only that partition is replaced
    one_year = o.filter(F.col("order_year") == 1995)
    sinks.write_partitioned(one_year, out, ["order_year"])
    assert spark.read.parquet(out).count() == first


def test_salted_aggregate_matches_plain(spark, sf_dir):
    l = table(spark, sf_dir, "lineitem")
    plain = {
        (r["l_returnflag"],): (r["n"], r["s"])
        for r in l.groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("l_quantity").cast("decimal(27,2)")).cast("double").alias("s"),
        )
        .collect()
    }
    salted = skew.salted_aggregate(
        l,
        ["l_returnflag"],
        {
            "n": lambda: F.count(F.lit(1)),
            "s": lambda: F.sum(F.col("l_quantity").cast("decimal(27,2)")).cast(
                "double"
            ),
        },
        n_salts=8,
        salt_source="l_orderkey",
    )
    got = {(r["l_returnflag"],): (r["n"], r["s"]) for r in salted.collect()}
    assert got == plain


def test_salted_broadcast_left_matches_plain(spark, sf_dir):
    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    c = table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    plain = o.join(c, "o_custkey").count()
    salted = skew.salted_broadcast_left(o, c, "o_custkey", n_salts=4)
    assert salted.count() == plain


def test_stateful_running_totals_across_batches(spark, tmp_path):
    """applyInPandasWithState accumulates per-user state across micro-batches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from airflow_postgres_to_s3_pipeline_spark.streaming import windows as sw
    from airflow_postgres_to_s3_pipeline_spark.streaming.stateful import (
        running_user_totals,
    )

    src = os.path.join(str(tmp_path), "stateful_src")
    os.makedirs(src)
    schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("ts", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("value", pa.float64()),
            ("props", pa.string()),
        ]
    )

    def write(name, rows):
        cols = list(zip(*rows))
        pq.write_table(
            pa.table(dict(zip(schema.names, cols)), schema=schema),
            os.path.join(src, name),
        )

    t0 = 1_700_000_000_000_000_000
    write("events-1.parquet", [(1, t0, 7, "click", 2.0, "{}"),
                              (2, t0 + 10**9, 7, "click", 3.0, "{}")])
    write("events-2.parquet", [(3, t0 + 2 * 10**9, 7, "view", 5.0, "{}"),
                               (4, t0, 8, "view", 1.0, "{}")])

    stream = running_user_totals(
        sw.read_events_stream(spark, src, max_files_per_trigger=1)
    )
    got = sw.run_stream_to_memory(stream, spark, output_mode="update")
    # update-mode memory sink keeps every emitted row; the LAST row per user
    # is the final state
    rows = got.collect()
    final = {}
    for r in rows:
        final[r["user_id"]] = (r["n_events"], r["total_value"], r["max_value"])
    assert final[7] == (3, 10.0, 5.0)
    assert final[8] == (1, 1.0, 1.0)
    # user 7 appeared in two batches -> at least two emissions (state carried)
    assert sum(1 for r in rows if r["user_id"] == 7) >= 2


def test_salted_aggregate_rejects_unmergeable(spark):
    """avg partials do not merge by sum/min/max — the old substring
    heuristic silently merged them with F.max (wrong results, no error);
    now it raises unless an explicit merge spec is given."""
    import pytest

    df = spark.createDataFrame([(1, 2.0), (1, 4.0), (2, 6.0)], ["k", "v"])
    with pytest.raises(ValueError, match="avg"):
        skew.salted_aggregate(
            df, ["k"], {"a": lambda: F.avg("v")}, n_salts=2
        )


def test_salted_aggregate_rejects_distinct(spark):
    """sum_distinct/count_distinct partials double-count values present
    under two salt buckets.  Spark renders them as plain "sum(x)" /
    "count(x)" in Column strings (the DISTINCT flag lives on the Catalyst
    node), so the old substring guard NEVER fired: the r10 review's live
    repro got 120.0 for a true sum(DISTINCT)=30.0 with no error.  The
    tree-based inference must raise."""
    import pytest

    df = spark.createDataFrame(
        [(1, 10.0), (1, 10.0), (1, 20.0), (2, 10.0)], ["k", "v"]
    )
    with pytest.raises(ValueError, match="DISTINCT"):
        skew.salted_aggregate(
            df, ["k"], {"sd": lambda: F.sum_distinct(F.col("v"))}, n_salts=4
        )
    with pytest.raises(ValueError, match="DISTINCT"):
        skew.salted_aggregate(
            df, ["k"], {"cd": lambda: F.count_distinct(F.col("v"))}, n_salts=4
        )


def test_salted_aggregate_rejects_composite(spark):
    """A composite over mergeable aggregates (sum/count = avg) must raise,
    not merge per-salt ratios by sum: the r10 review's live repro got 60.0
    for a true mean of 15.0 because the substring scan found "sum(" inside
    "/(sum(x), count(x))".  The top node is "/", not an aggregate."""
    import pytest

    df = spark.createDataFrame([(1, 10.0), (1, 20.0)], ["k", "v"])
    with pytest.raises(ValueError, match="do not merge"):
        skew.salted_aggregate(
            df, ["k"], {"m": lambda: F.sum("v") / F.count("v")}, n_salts=4
        )
    # non-aggregate top node (arithmetic over a plain column; "*" is an
    # UnresolvedFunction too, rejected by the same not-mergeable rule)
    with pytest.raises(ValueError, match="do not merge"):
        skew.salted_aggregate(
            df, ["k"], {"x": lambda: F.col("v") * 2}, n_salts=4
        )


def test_salted_aggregate_infers_through_cast_and_alias(spark):
    """Cast/Alias wrappers unwrap to the aggregate beneath: the inferred
    merge for cast(sum(v) as double) is sum, and results match the plain
    single-phase groupBy."""
    df = spark.createDataFrame(
        [(1, 1.5), (1, 2.5), (2, 4.0), (2, 6.0), (2, 10.0)], ["k", "v"]
    )
    out = {
        r["k"]: (r["s"], r["n"])
        for r in skew.salted_aggregate(
            df,
            ["k"],
            {
                "s": lambda: F.sum("v").cast("double").alias("ignored"),
                "n": lambda: F.count(F.lit(1)),
            },
            n_salts=3,
        ).collect()
    }
    assert out == {1: (4.0, 2), 2: (20.0, 3)}


def test_salted_aggregate_explicit_merge_spec(spark):
    """The (builder, merge) form: min partials merged by min."""
    df = spark.createDataFrame(
        [(1, 5.0), (1, 3.0), (2, 7.0), (2, 9.0)], ["k", "v"]
    )
    out = {
        r["k"]: r["lo"]
        for r in skew.salted_aggregate(
            df, ["k"], {"lo": (lambda: F.min("v"), "min")}, n_salts=3
        ).collect()
    }
    assert out == {1: 3.0, 2: 7.0}
