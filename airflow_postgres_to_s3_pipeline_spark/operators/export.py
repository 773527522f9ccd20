"""The engine's public operator API — parity with the reference's
``PostgresToS3Operator`` (plugins/custom_operator/postgres_to_s3_operator.py:10-71,
SURVEY.md §2A O2/X1-X3).

Same constructor surface (arbitrary SQL + templated output key), Spark-first
internals: the query runs through Catalyst over registered tables and the
result is written by executors — the reference's fetchall-into-StringIO
driver buffering (Q3, the O(result) memory anti-pattern) is not reproduced.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from airflow_postgres_to_s3_pipeline_spark.pipeline import export_to_storage


@dataclass
class QueryToStorageOperator:
    """Run arbitrary SQL over registered tables, write the result to object
    storage.

    Mirrors the reference operator's parameters: ``query`` and ``out_key``
    are templated with ``{ds}`` (the reference used Airflow Jinja
    ``{{ ds }}``, postgres_to_s3_operator.py:15); ``tables`` maps view name
    -> DataFrame provider so the operator is storage-agnostic (parquet
    table, JDBC source, anything that yields a DataFrame).
    """

    query: str
    out_base: str
    out_key: str = "export_{ds}.csv"
    fmt: str = "csv"
    single_file: bool = False
    tables: dict[str, DataFrame] = field(default_factory=dict)

    template_fields = ("query", "out_key")

    def render(self, ds: str) -> tuple[str, str]:
        # Replace ONLY the {ds} token — str.format would choke on any other
        # literal brace in an arbitrary SQL query (regex quantifiers like
        # \\d{4}, map/struct literals), narrowing the declared
        # arbitrary-SQL surface.  The reference's Jinja templating only ever
        # touched {{ ds }} (postgres_to_s3_operator.py:15).
        return (
            self.query.replace("{ds}", ds),
            f"{self.out_base}/{self.out_key.replace('{ds}', ds)}",
        )

    def execute(self, spark: SparkSession, ds: str) -> str:
        """Register views, run the (templated) SQL, distributed-write the
        result; returns the output path."""
        for name, df in self.tables.items():
            df.createOrReplaceTempView(name)
        sql, out_path = self.render(ds)
        result = spark.sql(sql)
        export_to_storage(result, out_path, self.fmt, self.single_file)
        return out_path


def table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive per-date table fingerprint — the integrity check
    a Postgres->S3 handoff needs on BOTH ends (the reference ships CSVs
    with no way to prove the lake copy equals the source;
    dags/airbnb_postgres_to_s3.py:149 just uploads).  Rows are
    canonically serialized, hashed, and combined with SUM mod 2^60 — a
    commutative/associative fold, so the checksum is independent of row
    order, partitioning, and engine, and two sides can each compute it
    locally and compare one number per export partition.  SUM, not
    BIT_XOR (the r10 review): under XOR any row duplicated an EVEN
    number of times cancels out entirely, so {A,A,rest} and {B,B,rest}
    share both n_rows and fingerprint — exactly the duplicate-and-drop
    corruption an export integrity check exists to catch.  Under SUM
    every multiplicity shifts the total; mod 2^60 keeps the fold in the
    60-bit domain both engines compute exactly (the sum itself runs in
    DECIMAL(38,0)/HUGEINT, overflow-free past 2^66 rows).

    Serialization discipline: every column is cast to a type with ONE
    cross-engine string form — ints/strings/dates verbatim, the money
    column through its original DECIMAL(15,2) (a raw DOUBLE's string form
    differs between engines: 1.5E4 vs 15000.0).  EVERY column's string
    form is coalesced to the '\\N' sentinel — concat_ws silently SKIPS
    null operands (shifting field alignment and making distinct rows
    serialize identically), so per-column coalesce is load-bearing, not
    defensive.

    Scale shape: map-side SUM partials per o_orderdate group — one thin
    shuffle of (date, decimal) partials regardless of table size.
    """
    from airflow_postgres_to_s3_pipeline_spark.catalog import table
    from pyspark.sql import functions as F

    o = table(spark, sf_dir, "orders")
    def ser(col):
        return F.coalesce(col.cast("string"), F.lit("\\N"))

    row_ser = F.concat_ws(
        "|",
        ser(F.col("o_orderkey")),
        ser(F.col("o_custkey")),
        ser(F.col("o_orderstatus")),
        ser(F.col("o_totalprice").cast("decimal(15,2)")),
        ser(F.col("o_orderdate")),
        ser(F.col("o_orderpriority")),
    )
    row_hash = F.conv(
        F.substring(F.md5(row_ser.cast("binary")), 1, 15), 16, 10
    ).cast("long")
    return (
        o.select(F.col("o_orderdate").alias("export_date"),
                 row_hash.alias("h"))
        .groupBy("export_date")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (
                F.sum(F.col("h").cast("decimal(38,0)"))
                % F.lit(2**60).cast("decimal(38,0)")
            )
            .cast("long")
            .alias("fingerprint"),
        )
    )


ORACLES: dict[str, str] = {
    "table_fingerprint": r"""
    SELECT o_orderdate AS export_date,
           COUNT(*) AS n_rows,
           CAST(SUM(('0x' || substring(md5(
               COALESCE(CAST(o_orderkey AS VARCHAR), '\N') || '|' ||
               COALESCE(CAST(o_custkey AS VARCHAR), '\N') || '|' ||
               COALESCE(o_orderstatus, '\N') || '|' ||
               COALESCE(CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR),
                        '\N') || '|' ||
               COALESCE(CAST(o_orderdate AS VARCHAR), '\N') || '|' ||
               COALESCE(o_orderpriority, '\N')
           ), 1, 15))::BIGINT)
                % 1152921504606846976 AS BIGINT) AS fingerprint
    FROM orders
    GROUP BY o_orderdate
    """,
}
