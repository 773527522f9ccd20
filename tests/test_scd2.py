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
