"""user_value_trend: the exact-integer closed form must agree with an
independent least-squares fit (numpy) — the oracle proves Spark == DuckDB,
this proves both compute an actual regression."""

from __future__ import annotations

import numpy as np

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import windows as w

SF_DIR = "/root/testdata/sf0.001"


def test_slope_intercept_match_numpy_lstsq(spark):
    got = {
        r.user_id: (r.n, r.slope_per_sec, r.intercept)
        for r in w.user_value_trend(spark, SF_DIR).collect()
    }
    assert got

    events = (
        table(spark, SF_DIR, "events")
        .select("user_id", "ts", "value")
        .collect()
    )
    per_user: dict = {}
    for r in events:
        per_user.setdefault(r.user_id, []).append((r.ts, r.value))

    checked = 0
    for user, obs in per_user.items():
        if user not in got:
            continue
        t0 = min(t for t, _ in obs)
        xs = np.array(
            [int((t - t0).total_seconds()) for t, _ in obs], dtype=float
        )
        ys = np.array([v for _, v in obs], dtype=float)
        if len(xs) < 2 or np.all(xs == xs[0]):
            continue
        slope, intercept = np.polyfit(xs, ys, 1)
        n, got_slope, got_intercept = got[user]
        assert n == len(xs)
        assert abs(got_slope - slope) <= 1e-9 * max(1.0, abs(slope))
        assert abs(got_intercept - intercept) <= 1e-6 * max(1.0, abs(intercept))
        checked += 1
    assert checked >= 5
