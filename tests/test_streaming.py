"""Structured Streaming: batch-equivalence (SURVEY.md §5) plus late-data
and stateful-dedup behaviors on controlled inputs."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import windows as batch_windows
from airflow_postgres_to_s3_pipeline_spark.streaming import windows as sw


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = sw.tumbling_counts(sw.read_events_stream(spark, sf_dir))
    got = sw.run_stream_to_memory(stream, spark, output_mode="complete")
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_session_equals_batch_operator(spark, sf_dir):
    stream = sw.session_counts(sw.read_events_stream(spark, sf_dir))
    got = sw.run_stream_to_memory(stream, spark, output_mode="complete")
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_dedup_drops_duplicate_events(spark, tmp_path):
    """Plant duplicate event_ids across two files (= two micro-batches)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(str(tmp_path), "stream_src")
    os.makedirs(src)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def write(name, rows):
        table_ = pa.table(
            {c: [r[i] for r in rows] for i, c in enumerate(cols)},
            schema=pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            ),
        )
        pq.write_table(table_, os.path.join(src, name))

    write("events-1.parquet", [(1, 1_700_000_000_000_000_000, 10, "click", 1.0, "{}")])
    write(
        "events-2.parquet",
        [
            (1, 1_700_000_000_000_000_000, 10, "click", 1.0, "{}"),  # dup id
            (2, 1_700_000_600_000_000_000, 11, "view", 2.0, "{}"),
        ],
    )
    stream = sw.dedup_stream(sw.read_events_stream(spark, src))
    got = sw.run_stream_to_memory(stream, spark, output_mode="append")
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [1, 2]
