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


def test_zorder_layout_skips_on_both_dimensions(spark, sf_dir, tmp_path):
    """Z-ordered files must carry narrow min/max ranges on BOTH keys: for
    a point-ish predicate on either dimension, only a strict subset of
    files can contain matches — single-key sorting only achieves this on
    the sort key."""
    from airflow_postgres_to_s3_pipeline_spark.sources.sinks import (
        write_zorder_layout,
    )

    out = os.path.join(str(tmp_path), "lineitem_z")
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    write_zorder_layout(li, out, "l_partkey", "l_suppkey", n_files=16)

    def file_ranges(col):
        ranges = []
        for f in os.listdir(out):
            if not f.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(out, f)).metadata
            idx = next(
                i for i in range(md.num_columns)
                if md.row_group(0).column(i).path_in_schema == col
            )
            lo = min(md.row_group(g).column(idx).statistics.min
                     for g in range(md.num_row_groups))
            hi = max(md.row_group(g).column(idx).statistics.max
                     for g in range(md.num_row_groups))
            ranges.append((lo, hi))
        return ranges

    n_files = len(file_ranges("l_partkey"))
    assert n_files >= 8
    for col in ("l_partkey", "l_suppkey"):
        ranges = file_ranges(col)
        domain_lo = min(lo for lo, _ in ranges)
        domain_hi = max(hi for _, hi in ranges)
        # probe 8 point predicates across the domain: on average a point
        # must be prunable from a meaningful share of files on EITHER dim
        probes = [
            domain_lo + (domain_hi - domain_lo) * k // 8 for k in range(8)
        ]
        overlap = sum(
            sum(1 for lo, hi in ranges if lo <= p <= hi) for p in probes
        ) / (len(probes) * n_files)
        assert overlap < 0.8, (
            f"{col}: z-order gives no skipping (overlap {overlap:.2f})"
        )


def test_read_side_row_group_skipping(spark, sf_dir, tmp_path):
    """The executed scan must actually SKIP on a clustered layout: same
    predicate, same rows out — but the scan on the sorted/z-ordered copy
    emits a fraction of the rows the random-layout scan emits, because
    whole row groups fail their min/max check.  This is the read-side
    metric (Spark UI's scan numOutputRows), not a footer-stats proxy."""
    from airflow_postgres_to_s3_pipeline_spark.plans import executed_scan_metrics
    from airflow_postgres_to_s3_pipeline_spark.sources.sinks import (
        write_sorted_layout,
        write_zorder_layout,
    )

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey", "l_quantity"
    )
    total = li.count()
    rand_path = os.path.join(str(tmp_path), "li_random")
    sort_path = os.path.join(str(tmp_path), "li_sorted")
    z_path = os.path.join(str(tmp_path), "li_zorder")
    # random layout: hash-repartition scatters every key range into every file
    li.repartition(16).write.parquet(rand_path)
    write_sorted_layout(li, sort_path, "l_partkey", n_files=16)
    write_zorder_layout(li, z_path, "l_partkey", "l_suppkey", n_files=16)

    lo, hi = li.agg(F.min("l_partkey"), F.max("l_partkey")).first()
    pred = F.col("l_partkey") <= lo + (hi - lo) // 20  # bottom ~5% of the domain

    def scan_rows(path):
        d = spark.read.parquet(path).where(pred).select("l_partkey")
        scans = [m for m in executed_scan_metrics(d) if "numOutputRows" in m]
        assert scans, "no file scan with metrics found in executed plan"
        return sum(m["numOutputRows"] for m in scans)

    rows_random = scan_rows(rand_path)
    rows_sorted = scan_rows(sort_path)
    rows_zorder = scan_rows(z_path)
    # the random layout's scan emits (essentially) the whole table;
    # clustered layouts must emit a strict fraction of it
    assert rows_random >= total * 0.9
    assert rows_sorted <= rows_random * 0.5, (rows_sorted, rows_random)
    assert rows_zorder <= rows_random * 0.5, (rows_zorder, rows_random)
    # and all three return identical query results
    counts = {
        spark.read.parquet(p).where(pred).count()
        for p in (rand_path, sort_path, z_path)
    }
    assert len(counts) == 1


def test_compact_small_files_preserves_data(spark, tmp_path):
    from airflow_postgres_to_s3_pipeline_spark.sources.sinks import (
        compact_small_files,
    )

    frag = str(tmp_path / "fragmented")
    compacted = str(tmp_path / "compacted")
    # 64 micro-files of ~16 rows — the streaming-sink fragmentation shape
    spark.range(1024).selectExpr(
        "id", "id % 13 AS k"
    ).repartition(64).write.parquet(frag)
    stats = compact_small_files(spark, frag, compacted, target_rows_per_file=256)
    assert stats["rows"] == 1024
    assert stats["files_before"] >= 32
    assert stats["files_after"] <= 8
    back = spark.read.parquet(compacted)
    assert back.count() == 1024
    assert sorted(r["id"] for r in back.collect()) == list(range(1024))


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """Lake-table schema evolution: batches written with a widening schema
    read back as the union under mergeSchema; old rows carry nulls in new
    columns.  (Default reads take ONE footer's schema — mergeSchema is an
    explicit opt-in because it reads every footer; both behaviors are the
    contract.)"""
    p = str(tmp_path / "evolving")
    spark.range(5).selectExpr("id", "id * 2 AS a").write.parquet(p)
    spark.range(5, 10).selectExpr(
        "id", "id * 2 AS a", "concat('x', id) AS b"
    ).write.mode("append").parquet(p)
    merged = spark.read.option("mergeSchema", "true").parquet(p)
    assert set(merged.columns) == {"id", "a", "b"}
    rows = {r["id"]: (r["a"], r["b"]) for r in merged.collect()}
    assert len(rows) == 10
    assert rows[2] == (4, None)
    assert rows[7] == (14, "x7")


def test_orc_scan_pushes_filters(spark, tmp_path):
    """Spark's native ORC reader must receive the pushed predicate
    (PushedFilters in the ORC scan node) exactly as the parquet path
    does — the property orc_scan_roundtrip's 100 TB story rests on."""
    p = str(tmp_path / "orc_push")
    spark.range(1000).selectExpr(
        "id", "id * 2.5 AS price"
    ).write.orc(p)
    back = spark.read.orc(p).filter("price > 100.0").select("id")
    plan = back._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "GreaterThan(price" in plan, plan[:1500]


def test_nested_struct_read_prunes_unused_subfield(spark, tmp_path):
    """Nested-schema pruning: selecting meta.status + meta.total from a
    three-field struct must shrink the parquet ReadSchema to the two
    referenced leaves — the unused ``priority`` field may not appear in
    the scan.  This is the property nested_struct_roundtrip's 100 TB
    story rests on (a fat unused subfield costs zero I/O)."""
    p = str(tmp_path / "nested_prune")
    spark.range(1000).selectExpr(
        "id",
        "named_struct('status', CAST(id % 3 AS STRING), "
        "'total', id * 2.5, "
        "'priority', repeat('x', 100)) AS meta",
    ).write.parquet(p)
    back = (
        spark.read.parquet(p)
        .select("id", F.col("meta.status"), F.col("meta.total"))
        .filter(F.col("total") > 100.0)
    )
    plan = back._jdf.queryExecution().executedPlan().toString()
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "status" in read_schema and "total" in read_schema, read_schema
    assert "priority" not in read_schema, read_schema


def test_nested_struct_roundtrip_matches_flat_recompute(spark, sf_dir):
    """The struct pack -> parquet -> pruned read -> aggregate chain must
    reproduce the flat-table aggregate exactly."""
    from airflow_postgres_to_s3_pipeline_spark.operators import layout

    got = {
        r["status"]: (r["n_orders"], round(r["sum_total"], 2))
        for r in layout.nested_struct_roundtrip(spark, sf_dir).collect()
    }
    o = table(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 150000.0)
    want = {
        r["o_orderstatus"]: (r["n"], round(r["s"], 2))
        for r in o.groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("double")
            .alias("s"),
        )
        .collect()
    }
    assert got == want


def test_roundtrip_reinvocation_keeps_prior_frame_readable(spark, sf_dir):
    """A second call to a roundtrip entry must NOT overwrite the files
    backing the first call's lazy DataFrame (r10 review: the pid-only
    scratch suffix made call 2's mode='overwrite' delete call 1's layout
    mid-lifetime).  Build frame 1, invoke again, then collect frame 1."""
    from airflow_postgres_to_s3_pipeline_spark.operators import (
        layout as layout_ops,
    )

    df1 = layout_ops.orc_scan_roundtrip(spark, sf_dir)
    first = df1.collect()
    layout_ops.orc_scan_roundtrip(spark, sf_dir).collect()
    assert df1.collect() == first
