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
