"""asof_join_pandas: bucket-count scaling (r8) and bucket invariance.

The r7 ADVICE flagged the fixed 64-bucket grouping: each applyInPandas
call receives 1/64 of the ENTIRE events table as one pandas DataFrame, so
per-call memory grew linearly with corpus size.  Buckets now scale with
input rows (~ASOF_TARGET_ROWS_PER_BUCKET per call); these tests pin the
formula and that results are bucket-count-invariant.
"""

from __future__ import annotations

from airflow_postgres_to_s3_pipeline_spark.operators import windows


def test_asof_bucket_count_formula():
    t = windows.ASOF_TARGET_ROWS_PER_BUCKET
    m = windows.ASOF_MIN_BUCKETS
    assert windows.asof_bucket_count(0) == m
    assert windows.asof_bucket_count(t * m) == m
    # past the floor, buckets track rows/target (ceil)
    assert windows.asof_bucket_count(t * 1000) == 1000
    assert windows.asof_bucket_count(t * 1000 + 1) == 1001
    # 100x corpus -> 100x buckets: per-call memory stays ~target rows
    assert windows.asof_bucket_count(t * 100_000) == 100_000


def test_asof_join_bucket_count_invariant(spark, sf_dir, monkeypatch):
    """Shrinking the target (more, smaller buckets) must not change a
    single matched row — hashing user_id keeps each user whole and
    merge_asof(by='user_id') is per-user."""
    base = {
        (r["event_id"], r["last_purchase_ts"])
        for r in windows.asof_join_pandas(spark, sf_dir).collect()
    }
    monkeypatch.setattr(windows, "ASOF_TARGET_ROWS_PER_BUCKET", 100)
    monkeypatch.setattr(windows, "ASOF_MIN_BUCKETS", 7)
    many = {
        (r["event_id"], r["last_purchase_ts"])
        for r in windows.asof_join_pandas(spark, sf_dir).collect()
    }
    assert base == many and len(base) > 0
