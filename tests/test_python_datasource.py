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


# ---------------------------------------------------------------------------
# Writer tier: two-phase-commit JSON-lines directory sink
# ---------------------------------------------------------------------------

def _read_committed(path):
    import json as j
    import os

    with open(os.path.join(path, "_SUCCESS")) as f:
        manifest = j.load(f)
    rows = []
    for name in manifest["files"]:
        with open(os.path.join(path, name)) as f:
            rows.extend(j.loads(line) for line in f)
    return manifest, rows


def test_json_dir_sink_batch_two_phase_commit(spark, tmp_path):
    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        JsonDirSinkDataSource,
    )

    spark.dataSource.register(JsonDirSinkDataSource)
    out = str(tmp_path / "sink_ok")
    df = spark.range(0, 100, 1, 4).selectExpr(
        "id", "concat('u', id % 7) AS tag"
    )
    df.write.format("json_dir_sink").option("path", out).mode(
        "append"
    ).save()
    manifest, rows = _read_committed(out)
    assert manifest["rows"] == 100
    assert sorted(r["id"] for r in rows) == list(range(100))
    assert all(r["tag"] == f"u{r['id'] % 7}" for r in rows)
    import os

    assert not os.path.isdir(os.path.join(out, "_staging")), (
        "staging must be cleaned after commit"
    )


def test_json_dir_sink_concurrent_writers_isolated(tmp_path):
    """Two writers targeting the same path stage under per-writer UUID
    subdirs (the FileFormatWriter per-jobId pattern): one writer's
    commit/abort must not see — let alone delete — the other's in-flight
    staged files.  Before r10 both shared <path>/_staging and commit()
    rmtree'd the whole thing, destroying any overlapping write."""
    import os

    from pyspark.sql import Row

    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        _JsonDirWriter,
        _stage_rows,
    )

    out = str(tmp_path / "sink_conc")
    os.makedirs(out)
    wa = _JsonDirWriter({"path": out})
    wb = _JsonDirWriter({"path": out})
    assert wa._staging != wb._staging
    ma = _stage_rows(wa._staging, iter([Row(id=1), Row(id=2)]))
    mb = _stage_rows(wb._staging, iter([Row(id=3)]))
    wa.commit([ma])  # A commits while B's staged file is still in flight
    assert os.path.exists(os.path.join(wb._staging, mb.name)), (
        "A's commit destroyed B's staged file"
    )
    wb.commit([mb])
    committed = [p for p in os.listdir(out) if p.endswith(".jsonl")]
    assert sorted(committed) == sorted([ma.name, mb.name])
    assert not os.path.isdir(os.path.join(out, "_staging")), (
        "shared staging root must be gone once the last writer commits"
    )
    # abort path: a third writer's abort leaves committed output intact
    wc = _JsonDirWriter({"path": out})
    _stage_rows(wc._staging, iter([Row(id=9)]))
    wc.abort([])
    assert sorted(
        p for p in os.listdir(out) if p.endswith(".jsonl")
    ) == sorted(committed)


def test_synthetic_events_batch_rejects_with_ts(spark):
    """with_ts is a stream-reader tier; schema() advertises ts whenever the
    option is set, but the batch reader never emits it — a batch read must
    fail fast at plan time, not crash per-partition on a tuple/schema
    mismatch (r10 review)."""
    import pytest as _pytest

    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        SyntheticEventsDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    with _pytest.raises(Exception, match="with_ts"):
        (
            spark.read.format("synthetic_events")
            .option("with_ts", "true")
            .load()
            .count()
        )


def test_json_dir_sink_failed_task_commits_nothing(spark, tmp_path):
    """Two-phase commit contract: a task failure means NO _SUCCESS and no
    committed data files — partial task output stays in staging only."""
    import os

    import pytest as _pytest

    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        JsonDirSinkDataSource,
    )

    spark.dataSource.register(JsonDirSinkDataSource)
    out = str(tmp_path / "sink_fail")
    df = spark.range(0, 100, 1, 4).selectExpr("id")
    with _pytest.raises(Exception):
        (
            df.write.format("json_dir_sink")
            .option("path", out)
            .option("fail_on_partition", "2")
            .mode("append")
            .save()
        )
    assert not os.path.exists(os.path.join(out, "_SUCCESS"))
    committed = [
        p for p in (os.listdir(out) if os.path.isdir(out) else [])
        if p.endswith(".jsonl")
    ]
    assert committed == [], f"leaked committed files: {committed}"


def test_json_dir_sink_streaming_per_batch_manifests(spark, tmp_path):
    """Streaming writer: one committed batch=<id>/ dir per micro-batch,
    manifest row counts summing to the full stream (4 batches x 256)."""
    import json as j
    import os

    from airflow_postgres_to_s3_pipeline_spark.sources.python_datasource import (
        JsonDirSinkDataSource,
        SyntheticEventsDataSource,
    )

    spark.dataSource.register(SyntheticEventsDataSource)
    spark.dataSource.register(JsonDirSinkDataSource)
    out = str(tmp_path / "stream_sink")
    ckpt = str(tmp_path / "stream_ckpt")
    stream = (
        spark.readStream.format("synthetic_events")
        .option("partitions", "4")
        .option("rows_per_batch", "256")
        .option("max_batches", "4")
        .load()
    )
    q = (
        stream.writeStream.format("json_dir_sink")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch_dirs = sorted(p for p in os.listdir(out) if p.startswith("batch="))
    assert len(batch_dirs) >= 4
    total = 0
    seen_ids = set()
    for b in batch_dirs:
        with open(os.path.join(out, b, "_MANIFEST")) as f:
            m = j.load(f)
        total += m["rows"]
        for name in m["files"]:
            with open(os.path.join(out, b, name)) as f:
                for line in f:
                    seen_ids.add(j.loads(line)["event_id"])
    assert total == 4 * 256
    assert len(seen_ids) == 4 * 256, "duplicate or missing events across batches"
