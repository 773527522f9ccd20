"""scd2_apply invariants beyond the oracle: the produced history must be a
valid SCD2 table — exactly one current row per key, intervals that chain
without gaps, and AS-OF lookups resolving to exactly one version."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.operators import advanced

SF_DIR = "/root/testdata/sf0.001"


def test_scd2_history_is_well_formed(spark):
    hist = advanced.scd2_apply(spark, SF_DIR)

    # exactly one current row per key
    currents = (
        hist.filter("is_current")
        .groupBy("c_custkey")
        .count()
        .filter(F.col("count") != 1)
        .count()
    )
    assert currents == 0

    # every key has a current row
    assert (
        hist.select("c_custkey").distinct().count()
        == hist.filter("is_current").count()
    )

    # closed rows chain into their successor: valid_to == successor's
    # valid_from, and only non-current rows are closed
    closed = hist.filter(F.col("valid_to").isNotNull())
    assert closed.filter("is_current").count() == 0
    succ = hist.select(
        "c_custkey", F.col("valid_from").alias("succ_from")
    )
    dangling = (
        closed.join(
            succ,
            (closed.c_custkey == succ.c_custkey)
            & (closed.valid_to == succ.succ_from),
            "left_anti",
        ).count()
    )
    assert dangling == 0


def test_scd2_asof_lookup_resolves_to_one_version(spark):
    hist = advanced.scd2_apply(spark, SF_DIR)
    asof = F.lit("1998-06-01").cast("timestamp")
    versions = hist.filter(
        (F.col("valid_from") <= asof)
        & (F.col("valid_to").isNull() | (F.col("valid_to") > asof))
    )
    per_key = versions.groupBy("c_custkey").count()
    assert per_key.filter(F.col("count") != 1).count() == 0
    # AS-OF after every change: resolved balances equal the current rows
    assert versions.count() == hist.filter("is_current").count()


def test_asof_join_is_count_preserving_and_time_correct(spark):
    """Every order resolves to exactly one dimension version, and the
    resolved version's interval genuinely covers the order date."""
    from pyspark.sql import functions as F

    from airflow_postgres_to_s3_pipeline_spark.catalog import table

    enriched = advanced.orders_asof_dimension(spark, SF_DIR)
    n_orders = table(spark, SF_DIR, "orders").count()
    assert enriched.count() == n_orders
    assert enriched.select("o_orderkey").distinct().count() == n_orders
    # time-correctness spot check: any order BEFORE the SCD2 cutoff must
    # resolve to the original (epoch-valid_from) version, i.e. the row
    # whose balance equals the customer's c_acctbal
    pre = (
        enriched.join(
            table(spark, SF_DIR, "customer").select(
                F.col("c_custkey").alias("o_custkey"), "c_acctbal"
            ),
            "o_custkey",
        )
        .filter(
            F.col("o_orderdate")
            < F.lit(advanced.SCD2_CUTOFF).cast("timestamp")
        )
    )
    assert pre.count() > 0
    assert pre.filter(F.col("balance_at_order") != F.col("c_acctbal")).count() == 0
