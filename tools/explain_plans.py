"""Dump formatted physical plans for selected queries (regenerates the raw
material behind docs/PLANS.md).

    python tools/explain_plans.py [sf_dir] [query ...]     # default: headline set
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DEFAULT = [
    "pricing_summary",
    "join_broadcast_dims",
    "join_range",
    "window_topk_per_customer",
    "minhash_lsh_dedup",
    "knn_bruteforce",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:] or DEFAULT

    from airflow_postgres_to_s3_pipeline_spark.session import get_spark
    from airflow_postgres_to_s3_pipeline_spark import registry
    from airflow_postgres_to_s3_pipeline_spark.plans import explain_str

    spark = get_spark(app_name="explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = registry.QUERIES[name](spark, sf_dir)
        print(f"##### {name}")
        print(explain_str(df, "formatted"))
        print()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
