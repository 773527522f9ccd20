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


def _run(spark, src_dir, max_files=None):
    events = sw.read_events_stream(spark, src_dir, max_files_per_trigger=max_files)
    res = sw.run_stream_to_memory(
        stateful.session_close_on_timeout(events), spark, output_mode="update"
    )
    return {
        (r.user_id, r.session_start_us, r.session_end_us, r.n_events)
        for r in res.collect()
    }


def _write_events(path, rows):
    """rows: list of (event_id, ts_us, user_id)."""
    import pyarrow as pa

    table = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array(["click"] * len(rows)),
            "value": pa.array([1.0] * len(rows)),
            "props": pa.array(["{}"] * len(rows)),
        }
    )
    pq.write_table(table, str(path))


def test_late_within_watermark_event_merges_into_open_session(
    spark, tmp_path
):
    """A late-but-within-watermark event older than the open session's
    last event must extend the session with min/max interval semantics —
    not drag the session end backward (which would later mis-split the
    session; the pre-fix state machine did exactly that)."""
    src = tmp_path / "ooo"
    src.mkdir()
    h = 3_600_000_000  # 1 hour in us
    base = 1_700_000_000_000_000
    # batch 0: user 1 at 10:00 and 10:10
    _write_events(src / "events_b0.parquet", [(1, base, 1), (2, base + h // 6, 1)])
    # batch 1: LATE event at 09:55 (within the 2h watermark), then 10:40
    # (30min40s after 10:10 would split if the end moved back to 09:55 —
    # 45min — but must merge: 10:40 - 10:10 = 30min <= gap)
    _write_events(
        src / "events_b1.parquet",
        [(3, base - h // 12, 1), (4, base + h * 2 // 3, 1)],
    )
    # batch 2: an event far past the gap closes the session immediately,
    # plus a high-ts event to push the watermark
    _write_events(
        src / "events_b2.parquet", [(5, base + 6 * h, 1), (6, base + 12 * h, 2)]
    )
    stamp_file_order(src)
    out = _run(spark, str(src), max_files=1)
    assert (1, base - h // 12, base + h * 2 // 3, 4) in out


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

class _FakeGroupState:
    """Minimal GroupState double for driving _close_user_sessions directly
    (the gap-already-expired branch is unreachable through Spark's
    late-data filter, so it is pinned at the function level)."""

    def __init__(self, wm_ms, state=None):
        self._wm_ms = wm_ms
        self._state = state
        self.hasTimedOut = False
        self.timeout_set = None

    @property
    def exists(self):
        return self._state is not None

    @property
    def get(self):
        return self._state

    def update(self, v):
        self._state = v

    def remove(self):
        self._state = None

    def getCurrentWatermarkMs(self):
        return self._wm_ms

    def setTimeoutTimestamp(self, ms):
        assert ms > self._wm_ms, "Spark rejects timeout <= watermark"
        self.timeout_set = ms


def _drive(ts_us_list, wm_ms, state=None):
    import pandas as pd

    st = _FakeGroupState(wm_ms, state)
    pdfs = iter(
        [pd.DataFrame({"ts": pd.to_datetime(ts_us_list, unit="us")})]
    ) if ts_us_list else iter([])
    out = list(stateful._close_user_sessions((7,), pdfs, st))
    rows = [
        tuple(r)
        for df in out
        for r in df[
            ["user_id", "session_start_us", "session_end_us", "n_events"]
        ].itertuples(index=False)
    ]
    return rows, st


def test_gap_expired_session_emits_immediately_not_withheld():
    """When the watermark has already passed (end + gap), the session must
    emit in THIS batch with state removed — the pre-fix code scheduled a
    watermark+1 timeout that a quiescent stream would never fire, silently
    withholding a session the oracle's (end+gap)+1 <= wm_final rule emits
    (ADVICE r5)."""
    gap_us = stateful.SESSION_GAP_SECONDS * 1_000_000
    base = 1_700_000_000_000_000
    wm_ms = (base + 2 * gap_us) // 1000  # watermark far past base + gap
    rows, st = _drive([base, base + 60_000_000], wm_ms)
    assert rows == [(7, base, base + 60_000_000, 2)]
    assert not st.exists and st.timeout_set is None


def test_open_session_schedules_timeout_past_watermark():
    gap_us = stateful.SESSION_GAP_SECONDS * 1_000_000
    base = 1_700_000_000_000_000
    wm_ms = base // 1000 - 1_000  # watermark just behind the event
    rows, st = _drive([base], wm_ms)
    assert rows == []
    assert st.get == (base, base, 1)
    assert st.timeout_set == (base + gap_us) // 1000 + 1


def test_us_resolution_timestamps_not_misscaled():
    """datetime64[us] input (pandas 2 Arrow paths) must produce the same
    micro-second session bounds as ns input — the bare int64//1000 cast
    would be 1000x off (ADVICE r5)."""
    import pandas as pd

    base = 1_700_000_000_000_000
    st = _FakeGroupState(0)
    pdf = pd.DataFrame(
        {"ts": pd.to_datetime([base, base + 1_000_000], unit="us").astype(
            "datetime64[us]"
        )}
    )
    list(stateful._close_user_sessions((7,), iter([pdf]), st))
    assert st.get == (base, base + 1_000_000, 2)
