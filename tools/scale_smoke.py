"""Scale headroom smoke: run core operator shapes at 100x the bench scale.

Generates synthetic fact data JVM-side (``spark.range`` + hash expressions —
no I/O bottleneck, no Python) and times the operator shapes that dominate at
100 TB: scan+filter+aggregate, two-key hash aggregate, broadcast join,
shuffle join, window rank, exact dedup.  Prints one JSON line with rows/sec
per shape.

    python tools/scale_smoke.py [n_rows] [shape ...]   # default 100_000_000, all shapes
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000_000
    only = set(sys.argv[2:])
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from airflow_postgres_to_s3_pipeline_spark.session import get_spark

    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    parallelism = spark.sparkContext.defaultParallelism

    def fact():
        # lineitem-ish synthetic fact: deterministic, generated in parallel
        return (
            spark.range(0, n, 1, parallelism)
            .select(
                F.col("id"),
                F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1_500_000)).alias("custkey"),
                F.pmod(F.xxhash64("id", F.lit(2)), F.lit(200_000)).alias("partkey"),
                (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5000)) / 100.0 + 1.0).alias("price"),
                F.pmod(F.xxhash64("id", F.lit(4)), F.lit(50)).alias("qty"),
                F.pmod(F.xxhash64("id", F.lit(5)), F.lit(3)).cast("string").alias("flag"),
            )
        )

    def run(label, df):
        if only and label not in only:
            return None
        t0 = time.time()
        df.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        return label, round(dt, 2), int(n / dt)

    dim = spark.range(0, 200_000).select(
        F.col("id").alias("partkey"),
        F.pmod(F.xxhash64("id"), F.lit(25)).cast("string").alias("brand"),
    )

    results = []
    # warm codegen
    fact().filter(F.col("qty") > 45).agg(F.count("*")).write.format("noop").mode("overwrite").save()

    results.append(run("filter_aggregate", fact().filter(F.col("qty") > 25).agg(
        F.sum("price").alias("s"), F.count("*").alias("c"))))
    results.append(run("hash_aggregate_2key", fact().groupBy("flag", "qty").agg(
        F.sum("price").alias("s"), F.count("*").alias("c"))))
    results.append(run("broadcast_join_agg", fact().join(F.broadcast(dim), "partkey")
                       .groupBy("brand").agg(F.sum("price").alias("s"))))
    results.append(run("shuffle_join", fact().alias("a").join(
        fact().select(F.col("id"), F.col("custkey").alias("ck2")).alias("b"), "id")
        .agg(F.count("*").alias("c"))))
    w = Window.partitionBy("custkey").orderBy(F.col("price").desc())
    results.append(run("window_topk", fact().withColumn("rn", F.row_number().over(w))
                       .filter(F.col("rn") <= 3).agg(F.count("*").alias("c"))))
    results.append(run("exact_dedup", fact().dropDuplicates(["custkey", "qty"])
                       .agg(F.count("*").alias("c"))))

    results = [r for r in results if r is not None]
    print(json.dumps({
        "n_rows": n,
        "parallelism": parallelism,
        "shapes": {lbl: {"sec": s, "rows_per_sec": rps} for lbl, s, rps in results},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
