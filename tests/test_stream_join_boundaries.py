"""Stream-stream outer-join eviction boundaries, pinned with sub-ms
probes (the oracles' watermark rules depend on them).

Empirical findings encoded here (see click_purchase_stream_join
docstring): with join window W and watermark wm = min(side maxes) - 2h,

- a CLICK null-extends only when click_ts + W + 1ms <= wm — Spark's
  state-value watermark carries a 1 ms safety margin, so a click exactly
  at the bound (or any amount under 1 ms below it) is WITHHELD;
- a PURCHASE null-extends when purchase_ts <= wm, INCLUDING exact
  equality.

On second-aligned event data the click rule is indistinguishable from
the strict `click_ts + W < wm` the oracles use; the purchase equality
case IS reachable (wm is second-aligned too), so the full-outer oracle
uses `<=`.  If Spark ever changes these margins, these tests fail before
the driver gate does.
"""

from __future__ import annotations

import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.streaming import windows as sw

H = 3_600_000_000  # 1 hour in us
MS = 1000
BASE = 1_700_000_000_000_000


def _write_events(path, rows):
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows]),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(t, os.path.join(path, "events.parquet"))


def _run(spark, d, how):
    clicks = sw.read_events_stream(spark, d).filter(
        F.col("event_type") == "click"
    )
    purchases = sw.read_events_stream(spark, d).filter(
        F.col("event_type") == "purchase"
    )
    j = sw.click_purchase_stream_join(clicks, purchases, how=how)
    return sw.run_stream_to_memory(j, spark, output_mode="append").collect()


def test_click_eviction_needs_one_ms_margin(spark, tmp_path):
    d = str(tmp_path)
    wm = BASE + 4 * H  # min(click max 6h, purchase max 8h) - 2h
    rows = [
        (200, wm - H - 1 * MS, 1200, "click"),  # bound + 1ms == wm -> emits
        (206, wm - H - 1, 1206, "click"),       # 1us under the bound -> withheld
        (103, wm - H, 1103, "click"),           # exactly at the bound -> withheld
        (3, BASE + 6 * H, 12, "click"),
        (4, BASE + 8 * H, 13, "purchase"),
    ]
    _write_events(d, rows)
    emitted = {r.click_id for r in _run(spark, d, "leftOuter")
               if r.purchase_id is None}
    assert 200 in emitted
    assert 206 not in emitted
    assert 103 not in emitted


def test_purchase_eviction_includes_exact_watermark_equality(spark, tmp_path):
    d = str(tmp_path)
    wm = BASE + 4 * H
    rows = [
        (1, wm, 10, "purchase"),        # exactly at wm -> emits
        (2, wm - 1, 11, "purchase"),    # below wm -> emits
        (3, BASE + 6 * H, 12, "click"),
        (4, BASE + 8 * H, 13, "purchase"),  # above wm -> withheld
    ]
    _write_events(d, rows)
    res = _run(spark, d, "fullOuter")
    unmatched_p = {r.purchase_id for r in res if r.click_id is None}
    assert {1, 2} <= unmatched_p
    assert 4 not in unmatched_p
    # user_id survives on right-unmatched rows (coalesced across sides)
    assert all(r.user_id is not None for r in res)
