"""Spark 4 state data source (`statestore` / `state-metadata` formats):
read a streaming query's keyed state straight out of its checkpoint.

At 100 TB this is the operational tool for stateful pipelines — inspect,
audit, or bulk-validate terabytes of keyed state WITHOUT replaying the
input stream, and time-travel it by batchId when debugging an incident.
These tests pin that the state a query checkpoints is exactly the state
the batch engine would compute, and that per-batch time travel shows
monotone accumulation.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.streaming import windows as sw

SF_DIR = "/root/testdata/sf0.001"


def _run_counts_query(spark, ckpt: str, max_files: int | None = None) -> None:
    events = sw.read_events_stream(spark, SF_DIR, max_files_per_trigger=max_files)
    import uuid

    name = f"state_reader_{uuid.uuid4().hex[:8]}"
    q = (
        events.groupBy("event_type")
        .count()
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def test_statestore_contents_equal_batch_aggregate(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    _run_counts_query(spark, ckpt)

    state = (
        spark.read.format("statestore")
        .load(ckpt)
        .select(
            F.col("key.event_type").alias("event_type"),
            F.col("value.count").alias("n"),
        )
    )
    got = {r.event_type: r.n for r in state.collect()}
    expect = {
        r.event_type: r.n
        for r in table(spark, SF_DIR, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == expect


def test_state_metadata_lists_the_stateful_operator(spark, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    _run_counts_query(spark, ckpt)
    meta = spark.read.format("state-metadata").load(ckpt)
    ops = {r.operatorName for r in meta.collect()}
    assert "stateStoreSave" in ops


def test_statestore_batchid_time_travel_is_monotone(spark, tmp_path):
    """With one input file per micro-batch, state at batch 0 must be a
    componentwise-<= prefix of the final state (counts only accumulate)."""
    ckpt = str(tmp_path / "ckpt")
    _run_counts_query(spark, ckpt, max_files=1)

    def state_at(batch_id: int | None):
        reader = spark.read.format("statestore")
        if batch_id is not None:
            reader = reader.option("batchId", str(batch_id))
        return {
            r.event_type: r.n
            for r in reader.load(ckpt)
            .select(
                F.col("key.event_type").alias("event_type"),
                F.col("value.count").alias("n"),
            )
            .collect()
        }

    first, final = state_at(0), state_at(None)
    assert final, "no state rows at the final batch"
    total_first = sum(first.values())
    total_final = sum(final.values())
    assert 0 < total_first <= total_final
    for k, v in first.items():
        assert v <= final.get(k, 0)
