"""AQE skew-join splitting: prove the runtime re-plan actually fires on a
skewed join (one key holding ~90% of rows) when thresholds are tuned for
local data sizes — the mechanism the engine relies on for hot keys that
explicit salting doesn't cover."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join(spark):
    confs = {
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        # fact: 200k rows, ~90% on key 0; dim: 1k distinct keys with payload
        fact = spark.range(200_000).select(
            F.when(F.col("id") % 10 != 0, F.lit(0))
            .otherwise(F.pmod(F.col("id"), 1000))
            .alias("k"),
            F.col("id").alias("v"),
        )
        dim = spark.range(1000).select(
            F.col("id").alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("p"),
        )
        joined = fact.join(dim, "k")
        # execute THIS DataFrame's plan (count() would wrap it in a new
        # query execution whose adaptive plan is separate)
        n = len(joined.collect())
        assert n == 200_000

        # executed adaptive plan must have applied the skew-join split
        final_plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in final_plan, final_plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
