"""streaming_chained_windows: two stateful window aggregations chained in
one query (hourly -> daily via window_time).  Multi-batch correctness under
time-ordered micro-batch splits — the arrival pattern of a real stream —
must equal the watermark-gated batch computation."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import normalize_events_ts
from airflow_postgres_to_s3_pipeline_spark.session import tune_runtime
from airflow_postgres_to_s3_pipeline_spark.streaming import windows as sw

from conftest import stamp_file_order


def _time_ordered_split(sf_dir, tmp_path, n_files: int):
    out = tmp_path / "tsplit"
    out.mkdir()
    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    n = t.num_rows
    for b in range(n_files):
        lo, hi = b * n // n_files, (b + 1) * n // n_files
        pq.write_table(t.slice(lo, hi - lo), str(out / f"events_{b}.parquet"))
    stamp_file_order(out)
    return str(out)


def _batch_expected(spark, split_dir):
    """Watermark-gated batch mirror: full-day rollups for days whose end is
    <= max(ts) - 2h."""
    tune_runtime(spark)
    e = normalize_events_ts(spark.read.parquet(f"{split_dir}/events_*.parquet"))
    wm = e.agg(
        (F.max("ts") - F.expr("INTERVAL 2 HOURS")).alias("wm")
    ).collect()[0]["wm"]
    hourly = (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    daily = (
        hourly.groupBy(
            F.window(F.col("w.start"), "1 day").alias("d"), "event_type"
        )
        .agg(F.max("n").alias("max_hourly"), F.sum("n").cast("long").alias("total"))
        .filter(F.col("d.end") <= F.lit(wm))
        .select(
            F.col("d.start").alias("day_start"),
            "event_type",
            "max_hourly",
            "total",
        )
    )
    return {
        (r.day_start, r.event_type): (r.max_hourly, r.total)
        for r in daily.collect()
    }


@pytest.mark.parametrize("n_files", [3, 5])
def test_chained_windows_multi_batch_equals_gated_batch(
    spark, sf_dir, tmp_path, n_files
):
    split_dir = _time_ordered_split(sf_dir, tmp_path, n_files)
    events = sw.read_events_stream(spark, split_dir, max_files_per_trigger=1)
    got = {
        (r.day_start, r.event_type): (r.max_hourly, r.total)
        for r in sw.run_stream_to_memory(
            sw.chained_hourly_daily(events), spark, output_mode="append"
        ).collect()
    }
    expected = _batch_expected(spark, split_dir)
    assert expected, "no closed days — watermark gate left nothing to check"
    assert got == expected


def test_chained_windows_daily_totals_aggregate_full_days(spark, sf_dir):
    """Emitted daily totals must equal the plain per-day batch counts —
    i.e. no hourly window of a closed day was dropped by the chain."""
    events = sw.read_events_stream(spark, sf_dir)
    got = {
        (r.day_start, r.event_type): r.total
        for r in sw.run_stream_to_memory(
            sw.chained_hourly_daily(events), spark, output_mode="append"
        ).collect()
    }
    tune_runtime(spark)
    e = normalize_events_ts(
        spark.read.option("pathGlobFilter", "events*.parquet").parquet(sf_dir)
    )
    per_day = {
        (r.day_start, r.event_type): r.total
        for r in e.groupBy(
            F.date_trunc("day", "ts").alias("day_start"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("total"))
        .collect()
    }
    for key, total in got.items():
        assert per_day[key] == total
