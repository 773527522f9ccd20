"""Physical layout controls: join hints and write layouts that drive data
skipping — the file-organization half of the 100 TB story."""

from __future__ import annotations

import os

import pyarrow.parquet as pq

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.plans import explain_str


def test_broadcast_hint_overrides_threshold(spark, sf_dir):
    """A SQL BROADCAST hint must force a broadcast join even when the
    autoBroadcast threshold would choose sort-merge."""
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        table(spark, sf_dir, "orders").createOrReplaceTempView("o_v")
        table(spark, sf_dir, "customer").createOrReplaceTempView("c_v")
        unhinted = spark.sql(
            "SELECT COUNT(*) FROM o_v JOIN c_v ON o_custkey = c_custkey"
        )
        assert "BroadcastHashJoin" not in explain_str(unhinted, "simple")
        hinted = spark.sql(
            "SELECT /*+ BROADCAST(c_v) */ COUNT(*) "
            "FROM o_v JOIN c_v ON o_custkey = c_custkey"
        )
        assert "BroadcastHashJoin" in explain_str(hinted, "simple")
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))


def test_range_partitioned_sorted_write_gives_disjoint_stats(spark, sf_dir, tmp_path):
    """repartitionByRange + sortWithinPartitions must produce parquet files
    whose per-file key ranges are (nearly) disjoint — the min/max layout
    that lets scans skip files on a key predicate."""
    from airflow_postgres_to_s3_pipeline_spark.sources.sinks import (
        write_sorted_layout,
    )

    out = os.path.join(str(tmp_path), "orders_sorted")
    o = table(spark, sf_dir, "orders")
    write_sorted_layout(o, out, "o_orderkey", n_files=8)
    ranges = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        col_idx = next(
            i for i in range(md.num_columns)
            if md.row_group(0).column(i).path_in_schema == "o_orderkey"
        )
        lo = min(
            md.row_group(g).column(col_idx).statistics.min
            for g in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(g).column(col_idx).statistics.max
            for g in range(md.num_row_groups)
        )
        ranges.append((lo, hi))
    ranges.sort()
    assert len(ranges) >= 4
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: {(lo_a, hi_a)} vs {(lo_b, hi_b)}"

    # and the filter is pushed so the disjoint stats actually skip
    filtered = spark.read.parquet(out).filter(F.col("o_orderkey") < 100)
    assert "o_orderkey" in " ".join(
        s for s in explain_str(filtered).split("PushedFilters")[1:2]
    )
