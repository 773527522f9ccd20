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
