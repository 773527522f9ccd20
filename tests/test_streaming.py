"""Structured Streaming: batch-equivalence (SURVEY.md §5) plus late-data
and stateful-dedup behaviors on controlled inputs."""

from __future__ import annotations

import os

import pytest

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import windows as batch_windows
from airflow_postgres_to_s3_pipeline_spark.streaming import windows as sw


def test_streaming_tumbling_equals_batch(spark, sf_dir):
    stream = sw.tumbling_counts(sw.read_events_stream(spark, sf_dir))
    got = sw.run_stream_to_memory(stream, spark, output_mode="complete")
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_session_equals_batch_operator(spark, sf_dir):
    stream = sw.session_counts(sw.read_events_stream(spark, sf_dir))
    got = sw.run_stream_to_memory(stream, spark, output_mode="complete")
    batch = (
        table(spark, sf_dir, "events")
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, batch.collect()))


def test_streaming_dedup_drops_duplicate_events(spark, tmp_path):
    """Plant duplicate event_ids across two files (= two micro-batches)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    src = os.path.join(str(tmp_path), "stream_src")
    os.makedirs(src)
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]

    def write(name, rows):
        table_ = pa.table(
            {c: [r[i] for r in rows] for i, c in enumerate(cols)},
            schema=pa.schema(
                [
                    ("event_id", pa.int64()),
                    ("ts", pa.int64()),
                    ("user_id", pa.int64()),
                    ("event_type", pa.string()),
                    ("value", pa.float64()),
                    ("props", pa.string()),
                ]
            ),
        )
        pq.write_table(table_, os.path.join(src, name))

    write("events-1.parquet", [(1, 1_700_000_000_000_000_000, 10, "click", 1.0, "{}")])
    write(
        "events-2.parquet",
        [
            (1, 1_700_000_000_000_000_000, 10, "click", 1.0, "{}"),  # dup id
            (2, 1_700_000_600_000_000_000, 11, "view", 2.0, "{}"),
        ],
    )
    stream = sw.dedup_stream(sw.read_events_stream(spark, src))
    got = sw.run_stream_to_memory(stream, spark, output_mode="append")
    ids = sorted(r["event_id"] for r in got.collect())
    assert ids == [1, 2]


def _split_events(spark, sf_dir, tmp_path, n_files: int, seed: int):
    """Copy sf events into n_files parquet files (events_0..N directly in
    the dir, matching read_events_stream's events* glob) with a seeded
    pseudo-random row split, so a maxFilesPerTrigger=1 stream sees n_files
    micro-batches over an order-independent partitioning of the same data.
    pyarrow preserves the on-disk ts representation."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    out = tmp_path / f"split_{seed}"
    out.mkdir()
    t = pq.read_table(f"{sf_dir}/events.parquet")
    ids = t.column("event_id").to_pylist()
    assign = [(i * 2654435761 + seed) % n_files for i in ids]
    for b in range(n_files):
        mask = pa.array(a == b for a in assign)
        pq.write_table(t.filter(mask), str(out / f"events_{b}.parquet"))
    return str(out)


@pytest.mark.parametrize("seed,n_files", [(1, 3), (7, 5)])
def test_streaming_tumbling_multi_batch_equals_batch(spark, sf_dir, tmp_path,
                                                     seed, n_files):
    """Batch-equivalence must hold for ANY micro-batch split, not just the
    single-batch arrival a one-file bounded source produces: stream the
    same events as n_files randomized micro-batches (maxFilesPerTrigger=1)
    and require the complete-mode result to equal the batch aggregate."""
    split_dir = _split_events(spark, sf_dir, tmp_path, n_files, seed)
    events = sw.read_events_stream(
        spark, split_dir, max_files_per_trigger=1
    )
    got = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in sw.run_stream_to_memory(
            sw.tumbling_counts(events), spark,
            output_mode="complete",
        ).collect()
    }
    from airflow_postgres_to_s3_pipeline_spark.catalog import normalize_events_ts
    from airflow_postgres_to_s3_pipeline_spark.session import tune_runtime

    tune_runtime(spark)
    batch = {
        (r["window_start"], r["event_type"]): r["n_events"]
        for r in normalize_events_ts(
            spark.read.parquet(f"{split_dir}/events_*.parquet")
        )
        .groupBy(
            F.window("ts", "1 hour").alias("w"), "event_type"
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events")
        .collect()
    }
    assert got == batch


def test_streaming_stateful_multi_batch_keeps_last_emission(spark, sf_dir,
                                                            tmp_path):
    """In update mode the memory sink appends one row per user per
    micro-batch; the registry entry must reduce to the LAST emission per
    user, so a multi-file source yields exactly the batch aggregate."""
    from airflow_postgres_to_s3_pipeline_spark.streaming import stateful

    split_dir = _split_events(spark, sf_dir, tmp_path, n_files=4, seed=3)
    events = sw.read_events_stream(
        spark, split_dir, max_files_per_trigger=1
    )
    out = stateful.running_user_totals(events)
    res = sw.run_stream_to_memory(out, spark, output_mode="update")
    got = {
        r["user_id"]: (r["n_events"], r["max_value"])
        for r in res.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("max_value").alias("max_value"),
        )
        .collect()
    }
    from airflow_postgres_to_s3_pipeline_spark.session import tune_runtime

    tune_runtime(spark)
    batch = {
        r["user_id"]: (r["n_events"], r["max_value"])
        for r in spark.read.parquet(f"{split_dir}/events_*.parquet")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.max("value").alias("max_value"))
        .collect()
    }
    assert got == batch
    # and the raw sink has MORE rows than users (multiple emissions) — the
    # reduction is load-bearing, not a no-op
    assert res.count() > len(got)


def test_streaming_static_enrich_multi_batch_equals_batch(spark, sf_dir,
                                                          tmp_path):
    """Stream-static join: the static dim joins every micro-batch without
    creating state, so a multi-file source must still equal the batch
    join+aggregate."""
    from airflow_postgres_to_s3_pipeline_spark.catalog import table

    split_dir = _split_events(spark, sf_dir, tmp_path, n_files=3, seed=11)
    events = sw.read_events_stream(spark, split_dir, max_files_per_trigger=1)
    dim = table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    agg = (
        sw.enrich_with_static_dim(events, dim)
        .withWatermark("ts", "2 hours")
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                F.col("c_mktsegment").alias("segment"), "n_events")
    )
    got = {
        (r["window_start"], r["segment"]): r["n_events"]
        for r in sw.run_stream_to_memory(
            agg, spark, output_mode="complete"
        ).collect()
    }
    from airflow_postgres_to_s3_pipeline_spark.catalog import normalize_events_ts
    from airflow_postgres_to_s3_pipeline_spark.session import tune_runtime

    tune_runtime(spark)
    batch_events = normalize_events_ts(
        spark.read.parquet(f"{split_dir}/events_*.parquet")
    )
    batch = {
        (r["window_start"], r["segment"]): r["n_events"]
        for r in batch_events.join(dim, F.col("user_id") == F.col("c_custkey"))
        .groupBy(F.window("ts", "1 hour").alias("w"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"),
                F.col("c_mktsegment").alias("segment"), "n_events")
        .collect()
    }
    assert got == batch


def test_streaming_left_outer_join_multi_batch_equals_final_watermark(
        spark, sf_dir, tmp_path):
    """The left-outer emitted set over a TIME-ORDERED multi-batch split
    must equal the final-watermark rule — matched pairs plus unmatched
    clicks with click_ts + 1h < min-side watermark (intermediate evictions
    are a subset of the final no-data-batch eviction).  The split must be
    time-ordered: a random split makes rows arrive behind the watermark,
    and streaming (correctly) drops late input instead of joining it."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from airflow_postgres_to_s3_pipeline_spark.catalog import normalize_events_ts

    split_dir = str(tmp_path / "time_split")
    os.makedirs(split_dir)
    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.sort_by("ts")
    n = t.num_rows
    for b, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3),
                                  (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo),
                       os.path.join(split_dir, f"events_{b}.parquet"))
    clicks = sw.read_events_stream(
        spark, split_dir, max_files_per_trigger=1
    ).filter(F.col("event_type") == "click")
    purchases = sw.read_events_stream(
        spark, split_dir, max_files_per_trigger=1
    ).filter(F.col("event_type") == "purchase")
    j = sw.click_purchase_stream_join(clicks, purchases, how="leftOuter")
    got = {
        (r["click_id"], r["purchase_id"])
        for r in sw.run_stream_to_memory(j, spark, "append").collect()
    }

    ev = normalize_events_ts(
        spark.read.parquet(f"{split_dir}/events_*.parquet")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"))
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    matched = c.join(p, cond)
    wm = min(
        c.agg(F.max("click_ts")).first()[0],
        p.agg(F.max("purchase_ts")).first()[0],
    )
    wm = wm.replace(microsecond=wm.microsecond // 1000 * 1000)  # ms watermark
    import datetime

    wm = wm - datetime.timedelta(hours=2)
    unmatched = (
        c.join(p, cond, "left_anti")
        .filter(F.col("click_ts") + F.expr("INTERVAL 1 HOUR") < F.lit(wm))
    )
    want = {(r["click_id"], r["purchase_id"]) for r in matched.collect()} | {
        (r["click_id"], None) for r in unmatched.collect()
    }
    assert got == want


def test_transform_with_state_tier(spark, sf_dir):
    """Spark 4 transformWithStateInPandas tier: same running totals as the
    applyInPandasWithState entry.  The state-server protocol requires the
    protobuf package; where the runtime lacks it (this container), the
    tier must be cleanly unavailable rather than half-working."""
    import pytest

    from airflow_postgres_to_s3_pipeline_spark.streaming import stateful

    if not stateful.has_tws_runtime():
        with pytest.raises(Exception):
            out = stateful.running_user_totals_tws(
                sw.read_events_stream(spark, sf_dir)
            )
            sw.run_stream_to_memory(out, spark, output_mode="update")
        pytest.skip(
            "transformWithState runtime unavailable: this container lacks "
            f"the wheel {stateful.TWS_MISSING_WHEEL} (pyspark 4.1.2's "
            "StateMessage_pb2 gencode pin; installs disallowed).  The "
            "applyInPandasWithState tier `running_user_totals` is the "
            "permanent equivalent, oracle-checked as "
            "streaming_stateful_running_totals."
        )
    events = sw.read_events_stream(spark, sf_dir)
    out = stateful.running_user_totals_tws(events)
    res = sw.run_stream_to_memory(out, spark, output_mode="update")
    got = {
        r["user_id"]: (r["n_events"], r["max_value"])
        for r in res.groupBy("user_id")
        .agg(F.max("n_events").alias("n_events"),
             F.max("max_value").alias("max_value"))
        .collect()
    }
    from airflow_postgres_to_s3_pipeline_spark.catalog import table as cat_table

    batch = {
        r["user_id"]: (r["n_events"], r["max_value"])
        for r in cat_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_events"),
             F.max("value").alias("max_value"))
        .collect()
    }
    assert got == batch


def test_dynamic_session_multi_batch_equals_batch(spark, sf_dir, tmp_path):
    """Dynamic-gap session windows over a time-ordered multi-batch split
    must equal the batch interval-merge (running max of per-event ends
    decides session breaks)."""
    import pyarrow.parquet as pq

    from pyspark.sql import Window

    from airflow_postgres_to_s3_pipeline_spark.catalog import normalize_events_ts

    split_dir = str(tmp_path / "dyn_split")
    os.makedirs(split_dir)
    t = pq.read_table(f"{sf_dir}/events.parquet").sort_by("ts")
    n = t.num_rows
    for b, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3),
                                  (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo),
                       os.path.join(split_dir, f"events_{b}.parquet"))

    events = sw.read_events_stream(spark, split_dir, max_files_per_trigger=1)
    got = sorted(
        map(tuple, sw.run_stream_to_memory(
            sw.dynamic_session_counts(events), spark, "complete"
        ).collect())
    )

    ev = normalize_events_ts(
        spark.read.parquet(f"{split_dir}/events_*.parquet")
    )
    gap_min = F.when(F.col("event_type") == "purchase", 60).otherwise(30)
    g = ev.select(
        "user_id", "ts",
        (F.col("ts") + gap_min * F.expr("INTERVAL 1 MINUTE")).alias("ev_end"),
    )
    w_prev = (
        Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    m = g.withColumn("prev_max_end", F.max("ev_end").over(w_prev))
    f = m.withColumn(
        "new_s",
        F.when(
            F.col("prev_max_end").isNull()
            | (F.col("ts") >= F.col("prev_max_end")),
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id").orderBy("ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    s = f.withColumn("sid", F.sum("new_s").over(w_run))
    batch = sorted(
        map(tuple, s.groupBy("user_id", "sid").agg(
            F.min("ts").alias("session_start"),
            F.max("ev_end").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        ).select("user_id", "session_start", "session_end", "n_events")
        .collect())
    )
    assert got == batch


def test_late_data_drop_is_discriminating(spark):
    """The late-drop entry must actually discriminate: batch 3 carries 40
    deterministic three-hour-late rows targeting the 22:00 window — if
    Spark kept them the emitted count would be 296, not 256.  The last
    hour's window must stay pending (its end is above the final
    watermark)."""
    from airflow_postgres_to_s3_pipeline_spark import registry

    res = registry.streaming_late_data_drop(spark, "unused")
    counts = {r.window_start.hour: r.n_events for r in res.collect()}
    assert counts == {22: 256, 23: 256, 0: 256}


def test_streaming_full_outer_join_multi_batch_equals_final_watermark(
        spark, sf_dir, tmp_path):
    """FULL OUTER over a time-ordered multi-batch split: matched pairs,
    plus unmatched clicks under the strict click rule, plus unmatched
    purchases under the INCLUSIVE purchase rule (p.ts <= wm) — the
    boundary semantics pinned in tests/test_stream_join_boundaries.py,
    invariant under batch splitting."""
    import datetime

    import pyarrow.parquet as pq

    from airflow_postgres_to_s3_pipeline_spark.catalog import normalize_events_ts

    split_dir = str(tmp_path / "time_split_fo")
    os.makedirs(split_dir)
    t = pq.read_table(f"{sf_dir}/events.parquet")
    t = t.sort_by("ts")
    n = t.num_rows
    for b, (lo, hi) in enumerate([(0, n // 3), (n // 3, 2 * n // 3),
                                  (2 * n // 3, n)]):
        pq.write_table(t.slice(lo, hi - lo),
                       os.path.join(split_dir, f"events_{b}.parquet"))
    clicks = sw.read_events_stream(
        spark, split_dir, max_files_per_trigger=1
    ).filter(F.col("event_type") == "click")
    purchases = sw.read_events_stream(
        spark, split_dir, max_files_per_trigger=1
    ).filter(F.col("event_type") == "purchase")
    j = sw.click_purchase_stream_join(clicks, purchases, how="fullOuter")
    res = sw.run_stream_to_memory(j, spark, "append").collect()
    got = {(r["click_id"], r["purchase_id"]) for r in res}
    assert all(r["user_id"] is not None for r in res)

    ev = normalize_events_ts(
        spark.read.parquet(f"{split_dir}/events_*.parquet")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        F.col("user_id").alias("c_user"), F.col("ts").alias("click_ts"),
        F.col("event_id").alias("click_id"))
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("purchase_ts"),
        F.col("event_id").alias("purchase_id"))
    cond = (
        (F.col("c_user") == F.col("p_user"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 1 HOUR"))
    )
    matched = c.join(p, cond)
    wm = min(
        c.agg(F.max("click_ts")).first()[0],
        p.agg(F.max("purchase_ts")).first()[0],
    )
    wm = wm.replace(microsecond=wm.microsecond // 1000 * 1000)
    wm = wm - datetime.timedelta(hours=2)
    un_c = (
        c.join(p, cond, "left_anti")
        .filter(F.col("click_ts") + F.expr("INTERVAL 1 HOUR") < F.lit(wm))
    )
    un_p = (
        p.join(c, cond, "left_anti")
        .filter(F.col("purchase_ts") <= F.lit(wm))
    )
    want = (
        {(r["click_id"], r["purchase_id"]) for r in matched.collect()}
        | {(r["click_id"], None) for r in un_c.collect()}
        | {(None, r["purchase_id"]) for r in un_p.collect()}
    )
    assert got == want
