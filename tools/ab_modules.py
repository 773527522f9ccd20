"""Interleaved same-session A/B of registry-entry functions between the
working tree and an alternative module file (e.g. the last commit's
version extracted with ``git show HEAD:path > /tmp/old.py``).

    python tools/ab_modules.py <old_module.py> <pkg.module> \
        [sf_dir] fn [fn ...]

Each fn is timed with the bench methodology (noop sink, tracked persists
released between runs), interleaved old/new per round, min-of-N
(SPARK_GRAFT_BENCH_RUNS, default 3) reported per variant.
"""

from __future__ import annotations

import importlib
import importlib.util
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    old_path, mod_name = sys.argv[1], sys.argv[2]
    sf_dir = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.1"
    fns = sys.argv[4:]
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    from airflow_postgres_to_s3_pipeline_spark.session import get_spark
    from airflow_postgres_to_s3_pipeline_spark.cache import release_persisted

    spec = importlib.util.spec_from_file_location("_ab_old", old_path)
    old = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(old)
    new = importlib.import_module(mod_name)

    spark = get_spark(app_name="ab_modules")
    spark.sparkContext.setLogLevel("ERROR")
    from airflow_postgres_to_s3_pipeline_spark import registry

    for warm in ("pricing_summary", "pandas_udf_score", "multimodal_decode"):
        registry.QUERIES[warm](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    release_persisted()
    spark.catalog.clearCache()

    def timed(fn):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        release_persisted()
        spark.catalog.clearCache()
        return dt

    for name in fns:
        runs_old, runs_new = [], []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"A(old): {name}")
            runs_old.append(timed(getattr(old, name)))
            spark.sparkContext.setJobDescription(f"B(new): {name}")
            runs_new.append(timed(getattr(new, name)))
        print(
            f"{name:32s} old min={min(runs_old):7.3f} {runs_old} | "
            f"new min={min(runs_new):7.3f} {runs_new}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
