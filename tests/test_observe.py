"""df.observe: in-flight pipeline metrics without a second scan — the
operational hook a production load uses to validate batch row counts /
null rates as part of the same job that writes the data."""

from __future__ import annotations

from pyspark.sql import Observation
from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table


def test_observe_collects_metrics_during_write(spark, sf_dir, tmp_path):
    obs = Observation("load_metrics")
    o = table(spark, sf_dir, "orders")
    staged = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.count(F.when(F.col("o_totalprice").isNull(), 1)).alias("null_prices"),
        F.max("o_orderdate").alias("max_date"),
    )
    staged.write.format("noop").mode("overwrite").save()
    metrics = obs.get
    assert metrics["n_rows"] == o.count()
    assert metrics["null_prices"] == 0
    assert metrics["max_date"] is not None


def test_observe_guards_bad_batch(spark, sf_dir):
    """The validation pattern: reject a batch when observed metrics violate
    the contract (here: a filter that drops everything must be caught)."""
    obs = Observation("guard")
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") < -1)
    flagged = o.observe(obs, F.count(F.lit(1)).alias("n_rows"))
    flagged.write.format("noop").mode("overwrite").save()
    assert obs.get["n_rows"] == 0  # caller would abort the publish step
