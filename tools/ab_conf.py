"""Interleaved same-session A/B of runtime-settable SQL confs.

    python tools/ab_conf.py "k=v;k2=v2" [sf_dir] query [query ...]

Variant A runs with the session defaults, variant B with the given confs
applied; confs are set/restored around every run so the interleaving is
honest.  Bench methodology otherwise (noop sink, tracked persists
released, min-of-N via SPARK_GRAFT_BENCH_RUNS).
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    conf_spec = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    names = sys.argv[3:]
    n_runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    confs = dict(kv.split("=", 1) for kv in conf_spec.split(";") if kv)

    from airflow_postgres_to_s3_pipeline_spark.session import get_spark
    from airflow_postgres_to_s3_pipeline_spark.cache import release_persisted
    from airflow_postgres_to_s3_pipeline_spark import registry

    spark = get_spark(app_name="ab_conf")
    spark.sparkContext.setLogLevel("ERROR")
    baseline = {k: spark.conf.get(k, None) for k in confs}
    for warm in ("pricing_summary", "pandas_udf_score", "multimodal_decode"):
        registry.QUERIES[warm](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    release_persisted()
    spark.catalog.clearCache()

    def set_confs(values):
        for k, v in values.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)

    def timed(fn):
        t0 = time.time()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        dt = round(time.time() - t0, 3)
        release_persisted()
        spark.catalog.clearCache()
        return dt

    for name in names:
        fn = registry.QUERIES[name]
        runs_a, runs_b = [], []
        for _ in range(n_runs):
            spark.sparkContext.setJobDescription(f"A(default): {name}")
            set_confs(baseline)
            runs_a.append(timed(fn))
            spark.sparkContext.setJobDescription(f"B(conf): {name}")
            set_confs(confs)
            runs_b.append(timed(fn))
        set_confs(baseline)
        print(
            f"{name:32s} default min={min(runs_a):7.3f} {runs_a} | "
            f"conf min={min(runs_b):7.3f} {runs_b}",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
