"""Layout-aware scan entries (E1/X-family): prove the write-side layouts
in sources/sinks.py round-trip through a real read path.

``tests/test_layout.py`` pins the physical property (parquet footer
min/max stats are narrow on both Z-order dimensions); this module adds
the END-TO-END evidence: write the layout, read it back cold, run a
two-dimensional range scan, and hash-match the result against the
original table — so a layout bug that corrupted, dropped, or duplicated
rows (not just mis-sorted them) is caught by the driver gate, not only
by footer inspection.

Reference parity note: the reference's S3 sink
(/root/reference/plugins/custom_operator/postgres_to_s3_operator.py:42)
writes a single CSV object with no layout control; Z-ordering is part of
this engine's 100 TB extension surface (SURVEY.md §2B E1).
"""

from __future__ import annotations

import atexit
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.sources.sinks import (
    write_zorder_layout,
)

ORACLES: dict[str, str] = {}


def _oracle(name: str, sql: str):
    ORACLES[name] = sql


# Fixed two-dimensional predicate, non-empty at every test SF (orderkeys
# and partkeys both start at 1 regardless of scale factor).
ZORDER_MAX_ORDERKEY = 1500
ZORDER_MAX_PARTKEY = 180


def _roundtrip_dir(prefix: str, sf_dir: str) -> str:
    """Per-CALL scratch dir for a write->read roundtrip entry.

    The pid suffix keeps concurrent harnesses (pytest + oracle sweep +
    the driver) off each other's layouts; the per-call counter keeps a
    SECOND invocation in the same process off the files that still back
    the FIRST call's lazy DataFrame — with a pid-only suffix, re-running
    the entry overwrote the directory under the earlier frame, so
    collecting it later read partial/deleted files (r10 review).  Every
    dir is registered for atexit removal, otherwise each bench round /
    driver session leaves table copies under /tmp.
    """
    _CALL_COUNTER[prefix] = _CALL_COUNTER.get(prefix, 0) + 1
    out = os.path.join(
        f"/tmp/spark_graft_{prefix}",
        f"{os.path.basename(os.path.normpath(sf_dir))}"
        f"_{os.getpid()}_{_CALL_COUNTER[prefix]}",
    )
    if out not in _CLEANUP_DIRS:
        _CLEANUP_DIRS.add(out)
        atexit.register(shutil.rmtree, out, ignore_errors=True)
    return out


_CLEANUP_DIRS: set[str] = set()
_CALL_COUNTER: dict[str, int] = {}


def zorder_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Write lineitem Z-ordered on (l_orderkey, l_partkey), read the
    layout back, and run a range scan on BOTH interleaved dimensions.

    The result aggregates the filtered read-back, so any row lost,
    duplicated, or value-corrupted by the normalize -> interleave ->
    range-partition -> sort -> write -> scan chain breaks the hash match
    against the oracle (which reads the ORIGINAL table).  The float sum
    goes through decimal(27,2) so it is partition-order independent.

    Scale shape: the write is one extra stats aggregate (broadcast 1-row
    frame) + one range shuffle — the same cost profile as a production
    OPTIMIZE ZORDER pass; the read scans a layout whose per-file min/max
    are narrow on both keys, so engines that prune on file/row-group
    stats (Spark's parquet reader prunes row groups via pushed filters)
    touch a fraction of the data for predicates on either dimension.
    """
    out = _roundtrip_dir("zorder_rt", sf_dir)
    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity", "l_returnflag"
    )
    write_zorder_layout(li, out, "l_orderkey", "l_partkey", n_files=8)
    back = spark.read.parquet(out)
    return (
        back.filter(
            (F.col("l_orderkey") <= ZORDER_MAX_ORDERKEY)
            & (F.col("l_partkey") <= ZORDER_MAX_PARTKEY)
        )
        .groupBy("l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("l_quantity").cast("decimal(27,2)"))
            .cast("double")
            .alias("sum_qty"),
            F.countDistinct("l_orderkey").alias("n_orders"),
        )
    )


_oracle(
    "zorder_scan_roundtrip",
    f"""
    SELECT l_returnflag,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
           COUNT(DISTINCT l_orderkey) AS n_orders
    FROM lineitem
    WHERE l_orderkey <= {ZORDER_MAX_ORDERKEY}
      AND l_partkey <= {ZORDER_MAX_PARTKEY}
    GROUP BY l_returnflag
    """,
)


def orc_scan_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC tier of the E1 format surface: write orders as ORC, read the
    files back, and aggregate a filtered scan — any row lost, duplicated,
    or value-shifted by the parquet -> ORC -> scan chain (including the
    TIMESTAMP column, the type with real cross-format semantics risk)
    breaks the hash match against the oracle, which reads the ORIGINAL
    parquet table.

    ORC is the other columnar format large Hadoop estates standardize
    on; Spark's native reader pushes predicates and prunes columns
    through it exactly as for parquet (tests/test_layout.py pins
    PushedFilters in the ORC scan node).  The double sum goes through
    decimal(27,2) so it is partition-order independent.
    """
    out = _roundtrip_dir("orc_rt", sf_dir)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderstatus", "o_totalprice", "o_orderdate"
    )
    o.write.mode("overwrite").orc(out)
    back = spark.read.orc(out)
    return (
        back.filter(F.col("o_totalprice") > 100000.0)
        .groupBy("o_orderstatus")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
            .cast("double")
            .alias("sum_price"),
            F.min("o_orderdate").alias("first_date"),
            F.max("o_orderdate").alias("last_date"),
        )
    )


_oracle(
    "orc_scan_roundtrip",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
               AS sum_price,
           MIN(o_orderdate) AS first_date,
           MAX(o_orderdate) AS last_date
    FROM orders
    WHERE o_totalprice > 100000.0
    GROUP BY o_orderstatus
    """,
)


def nested_struct_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-type tier of the E1/E2 surface: pack order attributes into a
    struct column, write parquet, read back selecting only two of the
    struct's three fields, and aggregate.  Spark's nested-schema pruning
    (`spark.sql.optimizer.nestedSchemaPruning.enabled`, on by default)
    pushes the subfield selection into the parquet ``ReadSchema`` so the
    scan decodes only the referenced leaf columns — at 100 TB a struct
    with a fat unused field (here ``priority``) costs nothing.
    tests/test_layout.py pins the pruned ReadSchema; the oracle
    recomputes the aggregate from the ORIGINAL flat table, so any row
    lost or value shifted by the struct pack -> parquet -> prune -> read
    chain breaks the hash.
    """
    out = _roundtrip_dir("nested_rt", sf_dir)
    o = table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_totalprice").alias("total"),
            F.col("o_orderpriority").alias("priority"),
        ).alias("meta"),
    )
    o.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    return (
        back.select(
            "o_orderkey",
            F.col("meta.status").alias("status"),
            F.col("meta.total").alias("total"),
        )
        .filter(F.col("total") > 150000.0)
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("total").cast("decimal(27,2)"))
            .cast("double")
            .alias("sum_total"),
        )
    )


_oracle(
    "nested_struct_roundtrip",
    """
    SELECT o_orderstatus AS status,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
               AS sum_total
    FROM orders
    WHERE o_totalprice > 150000.0
    GROUP BY o_orderstatus
    """,
)
