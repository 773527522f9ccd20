#!/usr/bin/env python
"""A/B the lsh_band_sweep persist strategy (r11 verdict task 4).

The entry is the round's noisiest bench line (6.7-7.9s across idle runs
at sf0.1); docs/SCALE.md attributes the spread to the persisted shingle
footprint riding the page cache.  Variants, each run in a FRESH process
(the spread shows up between bench invocations, so the experiment must
recreate that boundary):

  A  current: shingles MEMORY_AND_DISK (corpus level), sigs M_A_D
  B  shingles DISK_ONLY via SPARK_GRAFT_PERSIST_LEVEL (sigs unchanged)
  C  shingles NOT persisted (recomputed row-local per consumer; sigs
     still persisted) — tracked_persist(corpus=True) becomes a no-op

Usage: python tools/ab_band_sweep.py <variant> [n_runs]   # child mode
       python tools/ab_band_sweep.py                      # orchestrate
Prints per-run cold + warm-min timings; the orchestrator interleaves
variants round-robin so host drift hits all variants equally.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

N_INNER = 3  # bench.py's min-of-3 protocol


def child(variant: str) -> None:
    if variant == "B":
        os.environ["SPARK_GRAFT_PERSIST_LEVEL"] = "DISK_ONLY"
    from airflow_postgres_to_s3_pipeline_spark import cache, registry
    from airflow_postgres_to_s3_pipeline_spark.session import get_spark

    if variant == "C":
        orig = cache.tracked_persist

        def no_corpus_persist(df, corpus: bool = False):
            return df if corpus else orig(df)

        cache.tracked_persist = no_corpus_persist
        # operators import the symbol by name
        from airflow_postgres_to_s3_pipeline_spark.operators import dedup

        dedup.tracked_persist = no_corpus_persist

    spark = get_spark(app_name=f"ab-band-sweep-{variant}")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # same warm-up bench.py uses before timing
    registry.QUERIES["pricing_summary"](spark, sf_dir).write.format(
        "noop"
    ).mode("overwrite").save()
    times = []
    for _ in range(N_INNER):
        spark.catalog.clearCache()
        t0 = time.time()
        registry.QUERIES["lsh_band_sweep"](spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        times.append(round(time.time() - t0, 3))
        cache.release_persisted()
    print(json.dumps({"variant": variant, "cold": times[0],
                      "warm_min": min(times[1:]), "all": times}))


def main() -> None:
    if len(sys.argv) > 1:
        child(sys.argv[1])
        return
    results: dict[str, list[dict]] = {"A": [], "B": [], "C": []}
    for rnd in range(4):
        for variant in ("A", "B", "C"):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), variant],
                capture_output=True, text=True, cwd=REPO,
            )
            # A crashed child (import error, OOM kill) must surface its
            # own stderr, not a bare IndexError/JSONDecodeError here.
            if out.returncode != 0 or not out.stdout.strip():
                sys.stderr.write(out.stderr)
                raise SystemExit(
                    f"variant {variant} child exited "
                    f"{out.returncode} with no result line"
                )
            line = out.stdout.strip().splitlines()[-1]
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                sys.stderr.write(out.stderr)
                raise SystemExit(
                    f"variant {variant} child printed a non-JSON last "
                    f"line: {line!r}"
                )
            results[variant].append(rec)
            print(f"round {rnd} {variant}: {rec}", flush=True)
    for variant, recs in results.items():
        warms = [r["warm_min"] for r in recs]
        spread = (max(warms) - min(warms)) / min(warms) * 100
        print(f"{variant}: warms={warms} spread={spread:.1f}% "
              f"median={sorted(warms)[len(warms) // 2]}")


if __name__ == "__main__":
    main()
