from airflow_postgres_to_s3_pipeline_spark.plans.inspect import (  # noqa: F401
    explain_str,
    pushed_filters,
    has_broadcast_join,
    wholestage_codegen_spans,
    executed_scan_metrics,
    unpartitioned_windows,
)
