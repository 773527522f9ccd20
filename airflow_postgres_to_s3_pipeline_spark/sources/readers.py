"""Source connectors (SURVEY.md §2A S1-S2, §2B E1).

Thin, explicit wrappers over Spark's datasources: every reader takes an
explicit schema where the format allows it (schema inference is a full extra
pass at 100 TB) and leaves predicate pushdown / column pruning to Catalyst.
"""

from __future__ import annotations

import os
import urllib.request

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType


def read_parquet(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    """ORC scan — same columnar pushdown/pruning properties as parquet
    (predicate pushdown + column pruning verified in
    tests/test_sources_export.py); the interchange format for
    Hive/Trino-adjacent warehouses."""
    return spark.read.orc(path)


def read_csv(
    spark: SparkSession,
    path: str | list[str],
    schema: StructType | None = None,
    header: bool = True,
    null_value: str = "\\N",
    mode: str = "FAILFAST",
) -> DataFrame:
    """CSV scan; explicit schema preferred (inferSchema only when absent)."""
    reader = (
        spark.read.option("header", header)
        .option("nullValue", null_value)
        .option("mode", mode)
    )
    if schema is not None:
        reader = reader.schema(schema)
    else:
        reader = reader.option("inferSchema", True)
    return reader.csv(path)


def read_json(
    spark: SparkSession, path: str | list[str], schema: StructType | None = None
) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    predicates: list[str] | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    **options: str,
) -> DataFrame:
    """JDBC source (the reference's Postgres warehouse boundary, E1).

    Always pass partition_column/bounds for big tables — without them the
    whole table funnels through one connection.  Catalyst pushes filters
    into the remote SQL (the reference's WHERE load_date predicate shape,
    dags/airbnb_postgres_to_s3.py:149).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()


def write_jdbc(
    df: DataFrame, url: str, table: str, mode: str = "append",
    batchsize: int = 10000, **options: str
) -> None:
    """JDBC sink — batched inserts (the Spark analogue of the reference's
    COPY bulk-load claim, README.md:500-504)."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batchsize))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    writer.save()


def read_xml(
    spark: SparkSession,
    path: str,
    row_tag: str = "row",
    schema: StructType | None = None,
) -> DataFrame:
    """XML file scan (native in Spark 4 — the spark-xml package was folded
    into core).  Explicit schema preferred for the same
    no-inference-pass-at-100TB reason as CSV/JSON; row_tag picks the
    repeating element.  (Avro, the remaining interchange format, ships as
    an EXTERNAL module — its jar is not in this container, so there is no
    read_avro here rather than an untestable stub.)"""
    reader = spark.read.format("xml").option("rowTag", row_tag)
    if schema is not None:
        reader = reader.schema(schema)
    return reader.load(path)


def read_text(spark: SparkSession, path: str,
              whole_text: bool = False) -> DataFrame:
    """Line-oriented text scan (one ``value`` column) — the raw-corpus
    landing format for LLM text pipelines; whole_text=True reads each file
    as ONE row (document-per-file layouts).  NOTE: must be passed as the
    ``text()`` keyword — ``.option("wholetext", ...)`` is silently ignored
    by the Python reader in Spark 4.1 (measured; the test pins the
    working spelling)."""
    return spark.read.text(path, wholetext=whole_text)


def read_binary_files(spark: SparkSession, path: str, glob: str = "*") -> DataFrame:
    """Binary-file source for multimodal payloads (E28): (path, modTime,
    length, content) rows with the bytes as a binary column."""
    return (
        spark.read.format("binaryFile").option("pathGlobFilter", glob).load(path)
    )


def download_snapshots(
    url_template: str, dates: list[str], dest_dir: str, timeout: int = 30
) -> list[str]:
    """S1 parity: land remote snapshot files locally, skipping failures.

    Mirrors the reference's partial-failure tolerance (non-200 -> log and
    skip, dags/airbnb_postgres_to_s3.py:35-39).  Driver-side by design: the
    listing-file fetch is metadata-scale; the *data* path stays distributed.
    """
    os.makedirs(dest_dir, exist_ok=True)
    landed = []
    for date in dates:
        url = url_template.format(date=date)
        dest = os.path.join(dest_dir, f"listing-{date}.csv")
        try:
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                if resp.status != 200:
                    print(f"skip {url}: HTTP {resp.status}")
                    continue
                with open(dest, "wb") as f:
                    f.write(resp.read())
            landed.append(dest)
        except OSError as exc:
            print(f"skip {url}: {exc}")
    return landed
