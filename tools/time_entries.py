"""Time individual registry entries with the bench's exact methodology
(noop sink, cache released between runs, min-of-N + first-run cold).

    python tools/time_entries.py [sf_dir] query [query ...]

Env: SPARK_GRAFT_BENCH_RUNS (default 3).  Prints one line per query:
name, cold, min, all runs.  Use for same-session interleaved A/Bs —
cross-session comparisons need bench.py's idle gate.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    names = sys.argv[2:]
    if not names:
        print("usage: time_entries.py [sf_dir] query [query ...]")
        return 2
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from airflow_postgres_to_s3_pipeline_spark.session import get_spark
    from airflow_postgres_to_s3_pipeline_spark import registry
    from airflow_postgres_to_s3_pipeline_spark.cache import release_persisted

    spark = get_spark(app_name="time_entries")
    spark.sparkContext.setLogLevel("ERROR")
    # warm the same paths bench.py warms
    for warm in ("pricing_summary", "join_broadcast_dims",
                 "window_topk_per_customer", "pandas_udf_score",
                 "multimodal_decode"):
        registry.QUERIES[warm](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    release_persisted()
    spark.catalog.clearCache()

    for name in names:
        fn = registry.QUERIES[name]
        runs = []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"time: {name}")
            t0 = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            release_persisted()
            spark.catalog.clearCache()
        print(f"{name:36s} cold={runs[0]:7.3f} min={min(runs):7.3f} "
              f"runs={runs}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
