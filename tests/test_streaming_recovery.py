"""Checkpointed streaming recovery: a restarted query must resume from the
checkpoint and process ONLY new input — the exactly-once file-sink story."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.streaming import windows as sw

SCHEMA = pa.schema(
    [
        ("event_id", pa.int64()),
        ("ts", pa.int64()),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("value", pa.float64()),
        ("props", pa.string()),
    ]
)


def _write(src: str, name: str, rows):
    cols = list(zip(*rows))
    pq.write_table(
        pa.table(dict(zip(SCHEMA.names, cols)), schema=SCHEMA),
        os.path.join(src, name),
    )


def test_foreach_batch_partitioned_sink(spark, tmp_path):
    """foreachBatch: per-micro-batch custom sink logic (here: dynamic
    partition overwrite into an hourly-partitioned parquet table) — the
    production pattern for streaming upserts into a lake table."""
    import os as _os

    from pyspark.sql import functions as F

    src = _os.path.join(str(tmp_path), "fb_src")
    out = _os.path.join(str(tmp_path), "fb_out")
    ckpt = _os.path.join(str(tmp_path), "fb_ckpt")
    _os.makedirs(src)

    t0 = 1_700_000_000_000_000_000
    _write(src, "events-1.parquet",
           [(1, t0, 1, "a", 1.0, "{}"), (2, t0 + 3600 * 10**9, 1, "b", 2.0, "{}")])
    _write(src, "events-2.parquet",
           [(3, t0 + 2 * 3600 * 10**9, 2, "c", 3.0, "{}")])

    def sink(batch_df, batch_id):
        (
            batch_df.withColumn("hour", F.date_trunc("hour", "ts"))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("hour")
            .parquet(out)
        )

    stream = sw.read_events_stream(spark, src, max_files_per_trigger=1)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    result = spark.read.parquet(out)
    assert sorted(r["event_id"] for r in result.collect()) == [1, 2, 3]
    # hourly partitioning materialized on disk
    assert any("hour=" in p for p in _os.listdir(out))


def test_checkpoint_restart_processes_only_new_files(spark, tmp_path):
    src = os.path.join(str(tmp_path), "src")
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    os.makedirs(src)

    t0 = 1_700_000_000_000_000_000
    _write(src, "events-1.parquet", [(1, t0, 1, "a", 1.0, "{}"),
                                     (2, t0 + 10**9, 1, "b", 2.0, "{}")])

    def run_once():
        stream = sw.read_events_stream(spark, src).select(
            "event_id", "user_id", "event_type"
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once()
    assert sorted(
        r["event_id"] for r in spark.read.parquet(out).collect()
    ) == [1, 2]

    # new file lands; restart from the same checkpoint
    _write(src, "events-2.parquet", [(3, t0 + 2 * 10**9, 2, "c", 3.0, "{}")])
    run_once()

    rows = spark.read.parquet(out).collect()
    # event 1 and 2 must NOT be reprocessed (no duplicates), event 3 appended
    assert sorted(r["event_id"] for r in rows) == [1, 2, 3]


def test_restartable_python_source_resumes_from_committed_offset(
    spark, tmp_path
):
    """The SimpleDataSourceStreamReader tier must RESUME after a checkpoint
    restart: the restarted reader's read(start) receives the committed
    offset, so raising max_batches and restarting appends exactly the new
    batches — no duplicates (the partitioned reader's documented
    limitation is that it idles here)."""
    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        SyntheticEventsRestartableDataSource,
    )

    spark.dataSource.register(SyntheticEventsRestartableDataSource)
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")

    def run_once(max_batches: int):
        stream = (
            spark.readStream.format("synthetic_events_restartable")
            .option("rows_per_batch", "40")
            .option("max_batches", str(max_batches))
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once(max_batches=2)
    assert sorted(
        r["event_id"] for r in spark.read.parquet(out).collect()
    ) == list(range(80))

    # restart from the same checkpoint with two more batches available
    run_once(max_batches=4)
    got = sorted(r["event_id"] for r in spark.read.parquet(out).collect())
    # exactly-once continuation: batches 2-3 appended, 0-1 not re-emitted
    assert got == list(range(160))


def test_read_between_offsets_replays_span_despite_option_change():
    """Failure-replay fidelity at the reader level: readBetweenOffsets must
    regenerate a committed span byte-identically even when the reader was
    restarted with DIFFERENT options — the layout is encoded in the
    checkpointed offsets, so replay never depends on current options."""
    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        _EventsSimpleStreamReader,
    )

    original = _EventsSimpleStreamReader(
        {"rows_per_batch": "40", "partitions": "4", "max_batches": "3"}
    )
    start = original.initialOffset()
    committed = []  # (start_offset, end_offset, rows) per batch
    off = start
    for _ in range(3):
        rows, end = original.read(off)
        committed.append((off, end, list(rows)))
        off = end

    # a crashed-and-restarted reader with different options must still
    # replay every committed span exactly
    restarted = _EventsSimpleStreamReader(
        {"rows_per_batch": "7", "partitions": "2", "max_batches": "99"}
    )
    for s, e, rows in committed:
        assert list(restarted.readBetweenOffsets(s, e)) == rows
    # and a multi-batch span concatenates in batch order
    s0, _, r0 = committed[0]
    _, e1, r1 = committed[1]
    assert list(restarted.readBetweenOffsets(s0, e1)) == r0 + r1


def test_restartable_source_crash_replay_is_byte_identical(spark, tmp_path):
    """Crash injection: offset 1 is written to the checkpoint but its
    commit record is deleted (simulating a crash between offset-write and
    commit), so the restarted query must REPLAY batch 1 through
    readBetweenOffsets (the restarted process has an empty prefetch
    cache).  foreachBatch has no sink-side dedup log, so the replayed
    delivery is observable — and must be byte-identical to the original,
    even though the restart runs with a different rows_per_batch option."""
    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        SyntheticEventsRestartableDataSource,
    )

    spark.dataSource.register(SyntheticEventsRestartableDataSource)
    ckpt = os.path.join(str(tmp_path), "ckpt")
    seen: list[tuple[int, list[tuple]]] = []

    def run_once(rows_per_batch: int):
        stream = (
            spark.readStream.format("synthetic_events_restartable")
            .option("rows_per_batch", str(rows_per_batch))
            .option("max_batches", "2")
            .load()
        )

        def sink(batch_df, batch_id):
            seen.append((batch_id, sorted(tuple(r) for r in batch_df.collect())))

        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    run_once(rows_per_batch=40)
    first = dict(seen)
    assert sorted(first) == [0, 1] and len(first[1]) == 40

    # crash simulation: batch 1's offset survives, its commit does not
    # (also drop the Hadoop checksum sidecar — a real crash writes
    # neither, and a stale .crc blocks the re-commit rename)
    os.remove(os.path.join(ckpt, "commits", "1"))
    crc = os.path.join(ckpt, "commits", ".1.crc")
    if os.path.exists(crc):
        os.remove(crc)
    seen.clear()
    run_once(rows_per_batch=13)  # restart with a DIFFERENT layout option

    replays = dict(seen)
    assert 1 in replays, "restart must re-deliver the uncommitted batch"
    assert replays[1] == first[1], (
        "readBetweenOffsets replay must regenerate the committed batch "
        "byte-identically (layout from the offset, not current options)"
    )
    assert 0 not in replays, "committed batch 0 must not be re-delivered"


def test_restartable_source_rows_match_partitioned_source(spark):
    """Both Python-source tiers must emit bit-identical rows (one oracle
    covers either)."""
    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        SyntheticEventsDataSource,
        SyntheticEventsRestartableDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(SyntheticEventsRestartableDataSource)

    def drain(fmt):
        stream = (
            spark.readStream.format(fmt)
            .option("rows_per_batch", "30")
            .option("max_batches", "3")
            .option("with_ts", "true")
            .load()
        )
        res = sw.run_stream_to_memory(stream, spark, output_mode="append")
        return sorted(tuple(r) for r in res.collect())

    assert drain("synthetic_events_restartable") == drain("synthetic_events")
