"""Sinks: partitioned, bucketed, and format-parametrized writers (E1, X1-X3).

The two layout decisions that matter at 100 TB:

- **partitionBy(date-ish column)**: query-time partition pruning + dynamic
  partition overwrite for idempotent batch reloads (the reference's
  delete-then-insert, SURVEY.md T3).
- **bucketBy(key)**: pre-shuffles the table once at write time so every
  subsequent equi-join/groupBy on that key is shuffle-free.  A fact table
  bucketed on its join key amortizes one shuffle across every downstream
  query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    fmt: str = "parquet",
    mode: str = "overwrite",
    dynamic: bool = True,
) -> None:
    """Partitioned write with (optionally) dynamic partition overwrite —
    re-running a batch replaces only the partitions it produces."""
    writer = df.write.mode(mode).partitionBy(*partition_cols)
    if dynamic:
        writer = writer.option("partitionOverwriteMode", "dynamic")
    writer.format(fmt).save(path)


def write_bucketed_table(
    df: DataFrame,
    table_name: str,
    bucket_col: str,
    n_buckets: int = 32,
    sort_col: str | None = None,
    mode: str = "overwrite",
) -> None:
    """Bucketed (and optionally sorted) managed table.

    Joins between two tables bucketed on the same key with the same bucket
    count plan with zero Exchange operators (verified in
    tests/test_sinks.py) — the co-located-join strategy for repeated
    fact-fact joins.
    """
    writer = df.write.mode(mode).bucketBy(n_buckets, bucket_col)
    if sort_col:
        writer = writer.sortBy(sort_col)
    writer.format("parquet").saveAsTable(table_name)


def write_sorted_layout(
    df: DataFrame,
    path: str,
    key: str,
    n_files: int = 32,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Range-partitioned, key-sorted write: files carry (nearly) disjoint
    min/max statistics on ``key``, so point/range predicates skip whole
    files at scan time (verified in tests/test_layout.py).  The lightweight
    alternative to Z-ordering when one key dominates the read pattern.
    """
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def read_table(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def zorder_value(x, y, bits: int = 16):
    """Morton (Z-order) interleave of the low ``bits`` bits of two
    non-negative integer columns: bit b of x lands at position 2b, bit b
    of y at 2b+1.  Pure shift/mask expression — stays in whole-stage
    codegen, no UDF.

    Inputs must already be normalized to the SAME [0, 2^bits) range —
    interleaving keys of unequal magnitude lets the wider key's high bits
    dominate the order and the narrow key gets no skipping
    (``write_zorder_layout`` normalizes automatically).
    """
    from pyspark.sql import functions as F

    xc = F.col(x).cast("bigint") if isinstance(x, str) else x.cast("bigint")
    yc = F.col(y).cast("bigint") if isinstance(y, str) else y.cast("bigint")
    z = F.lit(0).cast("bigint")
    for b in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(xc, b) % 2, 2 * b)
            + F.shiftleft(F.shiftright(yc, b) % 2, 2 * b + 1)
        )
    return z


def write_zorder_layout(
    df: DataFrame,
    path: str,
    key_x: str,
    key_y: str,
    n_files: int = 32,
    bits: int = 10,
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> None:
    """Z-ordered write: files are range-partitioned and sorted on the
    Morton interleave of two keys, so per-file min/max statistics are
    narrow on BOTH dimensions and scans skip files for predicates on
    either key — the multi-dimensional upgrade of ``write_sorted_layout``
    (which skips on one key only).  Verified in tests/test_layout.py by
    reading back parquet footer statistics.

    Both keys are min-max normalized into [0, 2^bits) first (one extra
    stats aggregate, broadcast as a 1-row frame — the same pre-pass a
    production OPTIMIZE ZORDER runs); without it the wider-domain key's
    high bits dominate the interleave and the narrow key gets no
    skipping.
    """
    from pyspark.sql import functions as F

    zcol = "__zorder"
    top = (1 << bits) - 1
    stats = df.agg(
        F.min(key_x).cast("bigint").alias("_xlo"),
        F.max(key_x).cast("bigint").alias("_xhi"),
        F.min(key_y).cast("bigint").alias("_ylo"),
        F.max(key_y).cast("bigint").alias("_yhi"),
    )

    def norm(col, lo, hi):
        span = F.greatest(F.col(hi) - F.col(lo), F.lit(1))
        return (
            (F.col(col).cast("bigint") - F.col(lo)) * top / span
        ).cast("bigint")

    (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            zcol,
            zorder_value(
                norm(key_x, "_xlo", "_xhi"), norm(key_y, "_ylo", "_yhi"),
                bits,
            ),
        )
        .repartitionByRange(n_files, zcol)
        .sortWithinPartitions(zcol)
        .drop(zcol, "_xlo", "_xhi", "_ylo", "_yhi")
        .write.mode(mode)
        .format(fmt)
        .save(path)
    )


def compact_small_files(spark: SparkSession, path: str, out_path: str,
                        target_rows_per_file: int) -> dict:
    """Small-file compaction: rewrite a fragmented parquet directory into
    ~evenly-sized files (the maintenance pass every streaming/incremental
    lake table needs — thousands of KB-sized micro-batch files destroy
    scan throughput: per-file open cost, footer reads, and task-per-file
    scheduling dominate at 100 TB; the metastore/driver also pays per
    file).

    Distributed end-to-end: count -> ceil(n/target) -> repartition(n_out)
    -> write.  repartition (round-robin) gives evenly-SIZED output files,
    which is the goal here; use write_sorted_layout/write_zorder_layout
    instead when data-skipping locality matters more than file-count
    hygiene.  Returns {files_before, files_after, rows} for the caller to
    log/assert.
    """
    import math

    def count_parquet_files(p: str) -> int:
        # Hadoop FileSystem API, not os.listdir: the fragmented tables this
        # pass exists for live on shared storage (s3a://, hdfs://) where the
        # driver's local filesystem can't see the path
        jvm = spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(p)
        fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
        return sum(
            1
            for st in fs.listStatus(hpath)
            if st.getPath().getName().endswith(".parquet")
        )

    df = spark.read.parquet(path)
    rows = df.count()
    files_before = count_parquet_files(path)
    n_out = max(1, math.ceil(rows / target_rows_per_file))
    df.repartition(n_out).write.mode("overwrite").parquet(out_path)
    files_after = count_parquet_files(out_path)
    return {
        "files_before": files_before,
        "files_after": files_after,
        "rows": rows,
    }
