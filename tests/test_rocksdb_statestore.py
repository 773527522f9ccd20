"""Stateful streaming on the RocksDB state store — the backend you run at
scale.

The default HDFSBackedStateStoreProvider keeps every key's state in executor
heap; at 100 TB of input the keyed state (sessions per user, dedup keys,
per-key running aggregates) outgrows memory and the production answer is
RocksDB (spills to local SSD, supports changelog checkpointing).  These
tests re-run our stateful entries with
``spark.sql.streaming.stateStore.providerClass`` pointed at RocksDB
(rocksdbjni ships inside the pyspark distribution) and assert byte-identical
results vs the default provider — state backend must be a pure
performance/capacity choice, never a semantics change.
"""

from __future__ import annotations

from contextlib import contextmanager

from airflow_postgres_to_s3_pipeline_spark.streaming import stateful, windows

SF_DIR = "/root/testdata/sf0.001"

ROCKSDB = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)
PROVIDER_CONF = "spark.sql.streaming.stateStore.providerClass"


@contextmanager
def _provider(spark, cls: str | None):
    old = spark.conf.get(PROVIDER_CONF, None)
    if cls is None:
        spark.conf.unset(PROVIDER_CONF)
    else:
        spark.conf.set(PROVIDER_CONF, cls)
    try:
        yield
    finally:
        if old is None:
            spark.conf.unset(PROVIDER_CONF)
        else:
            spark.conf.set(PROVIDER_CONF, old)


def _canon(df):
    return sorted(tuple(str(v) for v in row) for row in df.collect())


def _run_session_counts(spark):
    events = windows.read_events_stream(spark, SF_DIR)
    return windows.run_stream_to_memory(
        windows.session_counts(events), spark, output_mode="append"
    )


def _run_dedup(spark):
    events = windows.read_events_stream(spark, SF_DIR)
    return windows.run_stream_to_memory(
        windows.dedup_stream(events, within_watermark=True),
        spark,
        output_mode="append",
    )


def _run_stateful_totals(spark):
    events = windows.read_events_stream(spark, SF_DIR, max_files_per_trigger=1)
    return windows.run_stream_to_memory(
        stateful.running_user_totals(events), spark, output_mode="update"
    )


def test_rocksdb_session_windows_match_default(spark):
    with _provider(spark, None):
        base = _canon(_run_session_counts(spark))
    with _provider(spark, ROCKSDB):
        rocks = _canon(_run_session_counts(spark))
    assert base and rocks == base


def test_rocksdb_dedup_within_watermark_matches_default(spark):
    with _provider(spark, None):
        base = _canon(_run_dedup(spark))
    with _provider(spark, ROCKSDB):
        rocks = _canon(_run_dedup(spark))
    assert base and rocks == base


def test_rocksdb_apply_in_pandas_with_state_matches_default(spark):
    """applyInPandasWithState (Arrow per-key state) over RocksDB — the
    custom-stateful-operator path a training-data pipeline would use for
    per-source running quotas."""
    with _provider(spark, None):
        base = _canon(_run_stateful_totals(spark))
    with _provider(spark, ROCKSDB):
        rocks = _canon(_run_stateful_totals(spark))
    assert base and rocks == base


def test_rocksdb_changelog_checkpointing_roundtrip(spark):
    """Changelog checkpointing (write deltas, not full snapshots) is the
    at-scale checkpoint cost fix; semantics must be unchanged."""
    conf = "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled"
    with _provider(spark, ROCKSDB):
        old = spark.conf.get(conf, None)
        spark.conf.set(conf, "true")
        try:
            rocks = _canon(_run_session_counts(spark))
        finally:
            if old is None:
                spark.conf.unset(conf)
            else:
                spark.conf.set(conf, old)
    with _provider(spark, None):
        base = _canon(_run_session_counts(spark))
    assert base and rocks == base


def _run_full_outer_join(spark):
    from pyspark.sql import functions as F

    clicks = windows.read_events_stream(spark, SF_DIR).filter(
        F.col("event_type") == "click"
    )
    purchases = windows.read_events_stream(spark, SF_DIR).filter(
        F.col("event_type") == "purchase"
    )
    return windows.run_stream_to_memory(
        windows.click_purchase_stream_join(clicks, purchases, how="fullOuter"),
        spark,
        output_mode="append",
    )


def test_rocksdb_full_outer_join_matches_default(spark):
    """The symmetric-hash join keeps BOTH sides' rows in keyed state and
    the outer-emission path reads eviction order out of the store — the
    state-backend-sensitive surface; results must be byte-identical."""
    with _provider(spark, None):
        base = _canon(_run_full_outer_join(spark))
    with _provider(spark, ROCKSDB):
        rocks = _canon(_run_full_outer_join(spark))
    assert base == rocks and base
