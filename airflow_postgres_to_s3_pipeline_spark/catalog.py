"""Table loader over the driver-generated parquet testdata.

At 100 TB these reads are partitioned parquet scans; expressing every query
against ``spark.read.parquet`` keeps predicate pushdown / column pruning /
partition pruning in play (verify with ``df.explain('formatted')`` —
``PushedFilters`` and ``ReadSchema`` must reflect the query).
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession

from airflow_postgres_to_s3_pipeline_spark.session import tune_runtime

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize an events-shaped frame's ``ts`` to plain TIMESTAMP
    regardless of the on-disk representation: TIMESTAMP(NANOS) reads as
    int64 nanoseconds (legacy conf) and converts via integer division —
    the same truncation DuckDB applies; TIMESTAMP(MICROS,
    isAdjustedToUTC=false) reads as TIMESTAMP_NTZ and casts, a no-op on
    the stored micros because the session timezone is pinned to UTC.
    Either way both engines see identical timestamps, and downstream
    watermarks / epoch arithmetic (which reject NTZ) always get a plain
    TIMESTAMP."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type == "timestamp_ntz":
        return df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


# per-session cache of analyzed table DataFrames: spark.read.parquet
# resolves the schema from a footer at creation, so re-creating the frame
# for every operator call re-pays one footer read per table per query
# (the r10 review measured register_views re-reading all 10 footers per
# SQL-surface call).  A DataFrame is an immutable plan — reusing it is
# semantically identical — but its FILE LISTING is resolved eagerly, so
# only the immutable driver testdata roots are cached: a test/smoke corpus
# rewritten in place between calls must be re-listed, exactly as before.
# Weak keying drops the cache with the session.
_TABLE_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)

_IMMUTABLE_ROOT = "/root/testdata/"


def table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one testdata table as a DataFrame (schema comes from parquet);
    ``events.ts`` is normalized to TIMESTAMP (see normalize_events_ts)."""
    tune_runtime(spark)
    abs_dir = os.path.abspath(sf_dir)
    cacheable = (abs_dir + "/").startswith(_IMMUTABLE_ROOT)
    if cacheable:
        per_session = _TABLE_CACHE.setdefault(spark, {})
        df = per_session.get((abs_dir, name))
        if df is not None:
            return df
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = normalize_events_ts(df)
    if cacheable:
        per_session[(abs_dir, name)] = df
    return df


# (abs_dir, name) -> row count, immutable driver testdata only (same
# rule as _TABLE_CACHE): a test corpus rewritten in place must re-read.
_ROWS_CACHE: dict[tuple[str, str], int] = {}


def table_rows(sf_dir: str, name: str) -> int:
    """Exact row count of one testdata table from parquet FOOTER metadata
    — a driver-side statistics read, no Spark job (r13 optimization: the
    GEMM shard/stride derivations each paid a count() job per entry call
    for a number the footer already stores).  Handles both a single
    ``<name>.parquet`` file and a directory of part files (sums their
    footers — the same bounded metadata pass any catalog statistic
    collection performs at scale).  Equals COUNT(*) by parquet contract,
    so every oracle that mirrors a count-derived parameter (adaptive
    stride, derived k, eval-sample stride) stays bit-identical."""
    import pyarrow.parquet as pq

    abs_dir = os.path.abspath(sf_dir)
    cacheable = (abs_dir + "/").startswith(_IMMUTABLE_ROOT)
    if cacheable and (abs_dir, name) in _ROWS_CACHE:
        return _ROWS_CACHE[(abs_dir, name)]
    path = os.path.join(abs_dir, f"{name}.parquet")
    if os.path.isdir(path):
        n = 0
        for root, dirs, files in os.walk(path):
            # mirror Spark's InMemoryFileIndex filtering: underscore/dot
            # prefixed paths (_temporary, _SUCCESS, .staging) are metadata,
            # not data — summing them would diverge from df.count() after
            # an interrupted write (r13 ADVICE)
            dirs[:] = [d for d in dirs if not d.startswith(("_", "."))]
            for f in files:
                if f.endswith(".parquet") and not f.startswith(("_", ".")):
                    n += pq.ParquetFile(
                        os.path.join(root, f)
                    ).metadata.num_rows
    else:
        n = pq.ParquetFile(path).metadata.num_rows
    if cacheable:
        _ROWS_CACHE[(abs_dir, name)] = n
    return n


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every testdata table as a temp view for Spark SQL queries.

    Re-registration on every call is deliberate (self-healing if a caller
    clobbered a view name); it's a catalog-only operation — the I/O-bearing
    part, footer/schema resolution, is cached per session in ``table``.
    """
    for name in TABLES:
        table(spark, sf_dir, name).createOrReplaceTempView(name)
