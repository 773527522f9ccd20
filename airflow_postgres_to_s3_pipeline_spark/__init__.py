"""PySpark-native analytics engine with the capabilities of the reference
``sumanthmalipeddi/airflow-postgres-to-s3-pipeline`` repo, rebuilt Spark-first.

The reference is an Airflow batch-ETL pipeline (CSV -> Postgres -> S3) whose
query surface is "arbitrary SQL on the warehouse table, results to object
storage" (see SURVEY.md §2A).  This package re-expresses that surface as a
declarative DataFrame/Spark-SQL engine, and extends it with the
LLM-data-pipeline operator set (dedup, similarity search, text analysis,
multimodal columns) designed for 100 TB scale:

- ``session``     SparkSession factory (AQE, UTC, arrow, dynamic overwrite)
- ``catalog``     testdata table loader / view registration
- ``pipeline``    reference-parity ETL (ingest -> warehouse -> export)
- ``operators``   relational query layer + LLM-data operators
- ``functions``   reusable column expression builders (vector math, text)
- ``sources``     readers/writers (csv/parquet/json/jdbc/http)
- ``streaming``   Structured Streaming operators over the events table
"""

from airflow_postgres_to_s3_pipeline_spark.session import get_spark  # noqa: F401
from airflow_postgres_to_s3_pipeline_spark.catalog import table, register_views  # noqa: F401

__all__ = ["get_spark", "table", "register_views"]
