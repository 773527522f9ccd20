"""session_close_on_timeout: EventTimeTimeout sessionization must produce
the same closed-session set whether sessions close intra-batch (single
bounded batch) or via state.hasTimedOut between micro-batches (time-ordered
multi-batch replay, where the advancing watermark genuinely fires
timeouts)."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.streaming import stateful
from airflow_postgres_to_s3_pipeline_spark.streaming import windows as sw


def _time_ordered_split(sf_dir, tmp_path, n_files: int):
    out = tmp_path / "tsplit"
    out.mkdir()
    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.sort_by([("ts", "ascending"), ("event_id", "ascending")])
    n = t.num_rows
    for b in range(n_files):
        lo, hi = b * n // n_files, (b + 1) * n // n_files
        pq.write_table(t.slice(lo, hi - lo), str(out / f"events_{b}.parquet"))
    return str(out)


def _run(spark, src_dir, max_files=None):
    events = sw.read_events_stream(spark, src_dir, max_files_per_trigger=max_files)
    res = sw.run_stream_to_memory(
        stateful.session_close_on_timeout(events), spark, output_mode="update"
    )
    return {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in res.collect()
    }


@pytest.mark.parametrize("n_files", [4])
def test_timeout_sessions_invariant_under_batch_split(
    spark, sf_dir, tmp_path, n_files
):
    single = _run(spark, sf_dir)
    split_dir = _time_ordered_split(sf_dir, tmp_path, n_files)
    multi = _run(spark, split_dir, max_files=1)
    assert single, "no sessions emitted"
    assert multi == single


def test_open_sessions_near_stream_end_are_withheld(spark, sf_dir):
    """Sessions whose timeout the final watermark never reaches must NOT be
    emitted (emitting them would be wrong on an unbounded stream)."""
    from airflow_postgres_to_s3_pipeline_spark.catalog import table

    emitted = _run(spark, sf_dir)
    gap_us = stateful.SESSION_GAP_SECONDS * 1_000_000
    max_us = (
        table(spark, sf_dir, "events")
        .agg(F.max(F.unix_micros("ts")).alias("m"))
        .collect()[0]["m"]
    )
    wm_ms = max_us // 1000 - 2 * 3600 * 1000
    # the session containing the globally-latest event can close neither by
    # a later event nor by timeout ((max+gap) > wm = max - 2h), so it must
    # be withheld — and more generally every emitted session either was
    # followed by a later same-user event (end < that user's last event) or
    # had its timeout reached
    assert all(end_us != max_us for (_, _, end_us, _) in emitted)
    from collections import defaultdict

    user_last = defaultdict(int)
    for r in (
        table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.max(F.unix_micros("ts")).alias("m"))
        .collect()
    ):
        user_last[r.user_id] = r.m
    for (user, _, end_us, _) in emitted:
        closed_by_later = end_us < user_last[user]
        closed_by_timeout = (end_us + gap_us) // 1000 + 1 <= wm_ms
        assert closed_by_later or closed_by_timeout