"""funnel_conversion: ordered-step semantics the oracle match alone can't
prove wrong-by-construction — a purchase BEFORE the first view must not
count, and latencies are measured from funnel entry."""

from __future__ import annotations

import datetime as dt

from airflow_postgres_to_s3_pipeline_spark.operators import windows as w


def _write_events(spark, path: str, rows):
    df = spark.createDataFrame(
        [
            (i, user, typ, dt.datetime(2024, 1, 1, 0, 0, sec))
            for i, (user, typ, sec) in enumerate(rows)
        ],
        "event_id long, user_id long, event_type string, ts timestamp",
    )
    df.coalesce(1).write.mode("overwrite").parquet(f"{path}/events.parquet")


def test_out_of_order_steps_do_not_count(spark, tmp_path):
    d = str(tmp_path)
    _write_events(
        spark,
        d,
        [
            # user 1: clean funnel view(10) -> click(20) -> purchase(50)
            (1, "view", 10),
            (1, "click", 20),
            (1, "purchase", 50),
            # user 2: purchase BEFORE the view; click after view, no
            # purchase after the click -> reaches step 2 only
            (2, "purchase", 5),
            (2, "view", 10),
            (2, "click", 30),
            # user 3: click before view -> reaches step 1 only
            (3, "click", 5),
            (3, "view", 10),
            # user 4: never views -> not in the funnel at all
            (4, "click", 10),
            (4, "purchase", 20),
        ],
    )
    got = {r.step: (r.n_users, r.avg_latency_us) for r in
           w.funnel_ordered_3step(spark, d).collect()}
    assert got["1_view"] == (3, None)
    # user1 click latency 10s, user2 click latency 20s -> mean 15s
    assert got["2_click"] == (2, 15_000_000)
    # only user1 purchases after clicking: 50-10 = 40s from funnel entry
    assert got["3_purchase"] == (1, 40_000_000)


def test_same_timestamp_step_counts_inclusively(spark, tmp_path):
    d = str(tmp_path)
    _write_events(
        spark,
        d,
        [(1, "view", 10), (1, "click", 10), (1, "purchase", 10)],
    )
    got = {r.step: r.n_users for r in w.funnel_ordered_3step(spark, d).collect()}
    assert got == {"1_view": 1, "2_click": 1, "3_purchase": 1}
