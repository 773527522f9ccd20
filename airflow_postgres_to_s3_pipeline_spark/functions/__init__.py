from airflow_postgres_to_s3_pipeline_spark.functions.numeric import dsum, davg  # noqa: F401
from airflow_postgres_to_s3_pipeline_spark.functions.vector import (  # noqa: F401
    cosine_similarity,
    to_double_array,
    l2_norm,
)
