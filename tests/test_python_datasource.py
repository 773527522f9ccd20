"""Custom Python DataSource (Spark 4 connector API): partitioned reads,
determinism, and composition with ordinary DataFrame ops."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
    SyntheticEventsDataSource,
)


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(SyntheticEventsDataSource)
    return spark


def _read(spark, partitions=4, rows=250):
    return (
        spark.read.format("synthetic_events")
        .option("partitions", str(partitions))
        .option("rows_per_partition", str(rows))
        .load()
    )


def test_row_count_and_schema(registered):
    df = _read(registered)
    assert df.count() == 1000
    assert df.columns == ["event_id", "user_id", "event_type", "value"]
    assert df.rdd.getNumPartitions() == 4


def test_deterministic_across_reads(registered):
    a = sorted(map(tuple, _read(registered).collect()))
    b = sorted(map(tuple, _read(registered).collect()))
    assert a == b


def test_composes_with_dataframe_ops(registered):
    df = _read(registered, partitions=2, rows=500)
    agg = (
        df.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    rows = agg.collect()
    assert all(r["n"] >= 1 for r in rows)
    # event_ids are globally unique across partitions
    assert df.select("event_id").distinct().count() == 1000


def test_stream_reader_bounded_batches_deterministic(spark):
    """The streaming tier delivers exactly max_batches x rows_per_batch
    rows with globally unique event_ids, and two runs produce identical
    rows (every cell a pure hash of its coordinates)."""
    from pyspark.sql import functions as F

    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        SyntheticEventsDataSource,
    )
    from airflow_postgres_to_s3_pipeline_spark.streaming.windows import (
        run_stream_to_memory,
    )

    spark.dataSource.register(SyntheticEventsDataSource)

    def run():
        stream = (
            spark.readStream.format("synthetic_events")
            .option("partitions", "2")
            .option("rows_per_batch", "50")
            .option("max_batches", "3")
            .load()
        )
        return run_stream_to_memory(stream, spark, output_mode="append")

    got = run().collect()
    assert len(got) == 3 * 50  # 3 batches x (2 parts x 25 rows)
    ids = sorted(r["event_id"] for r in got)
    assert ids == list(range(150))
    again = run().collect()
    assert sorted(map(tuple, got)) == sorted(map(tuple, again))
