"""Local replica of the driver's correctness gate.

Runs every ``queries()`` entry on Spark and its ``oracle_sql()`` mirror on
DuckDB over the same parquet, then compares row count, column names, an
order-insensitive value representation, and (since r14) the oracle's planned
column TYPES against the Spark schema — ``fetchall()`` values are type-blind
(DuckDB HUGEINT and BIGINT both arrive as Python int), but the driver's hash
is typed, so an uncast aggregate passes here and fails the driver (the r13
``vocab_growth_curve`` regression).  Run before committing:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time
import traceback

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tools"))

from oracle_dtypes import normalize_duck, spark_to_duck  # noqa: E402

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


STRICT_FLOATS = os.environ.get("SPARK_GRAFT_STRICT_FLOATS") == "1"


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # strict mode compares full IEEE bits (repr round-trips doubles);
        # default mirrors a 10-significant-digit driver-style hash
        return repr(v) if STRICT_FLOATS else f"{v:.10g}"
    if isinstance(v, bool):
        return str(v)
    return str(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for row in rows:
        out.append(tuple(norm_cell(row[i]) for i in order))
    out.sort()
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from airflow_postgres_to_s3_pipeline_spark.cache import release_persisted
    from airflow_postgres_to_s3_pipeline_spark.session import get_spark

    # Partition count is env-overridable so the gate can be re-run at
    # different parallelism — results must be identical at ANY setting
    # (the determinism-under-partitioning design rule).
    # SPARK_GRAFT_VANILLA=1 replicates the DRIVER's execution mode: a bare
    # SparkSession with none of our session-factory confs (catalog.table's
    # tune_runtime must supply everything correctness needs) — the window
    # pre-flight before each rotation.
    if os.environ.get("SPARK_GRAFT_VANILLA") == "1":
        from pyspark.sql import SparkSession

        spark = SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]"
        ).getOrCreate()
    else:
        spark = get_spark(
            shuffle_partitions=int(os.environ.get("SPARK_GRAFT_SHUFFLE", "8"))
        )

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    unknown = only - set(qs)
    if unknown:
        # a typo'd/unregistered name must be a hard error — silently
        # skipping it prints a vacuous "all queries match"
        print(f"ERROR: not in queries(): {sorted(unknown)}")
        return 2
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception:
            print(f"FAIL  {name}: spark error")
            traceback.print_exc()
            failures.append(name)
            continue
        finally:
            # terminal consumer reached — release this query's tracked
            # persists so a 155-entry sweep never accumulates caches
            release_persisted()
        elapsed = time.time() - t0
        if name not in oracles:
            # rows-only entries (no SQL-expressible oracle) must still
            # produce SOMETHING: a regression to an empty frame (inverted
            # filter, dead candidate chain) previously printed here and the
            # gate exited 0 anyway (r10 review) — mirror the driver's
            # rows>0 smoke so it fails pre-commit instead
            if len(rows) == 0:
                print(f"FAIL  {name}: rows-only entry returned 0 rows")
                failures.append(name)
            else:
                print(f"rows-only  {name}: {len(rows)} rows  ({elapsed:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc()
            failures.append(name)
            continue
        ok = True
        # typed-hash guard: DESCRIBE the oracle and compare normalized type
        # families against the Spark schema (oracle_dtypes holds the
        # driver-calibrated rules: int widths collapse, HUGEINT does not)
        spark_types = {f.name: f.dataType for f in df.schema.fields}
        for col, dtype, *_ in con.execute(f"DESCRIBE {oracles[name]}").fetchall():
            if col not in spark_types:
                continue  # column-name divergence is reported below
            want = spark_to_duck(spark_types[col])
            if normalize_duck(dtype) != want:
                print(
                    f"FAIL  {name}: oracle type {col}={dtype} vs spark {want}"
                    " (uncast aggregate? the driver's typed hash will reject it)"
                )
                ok = False
        if len(rows) != len(orows):
            print(f"FAIL  {name}: rowcount spark={len(rows)} duckdb={len(orows)}")
            ok = False
        if sorted(cols) != sorted(ocols):
            print(f"FAIL  {name}: columns spark={sorted(cols)} duckdb={sorted(ocols)}")
            ok = False
        if ok:
            a = norm_rows(cols, rows)
            b = norm_rows(ocols, orows)
            if a != b:
                diff = [(x, y) for x, y in zip(a, b) if x != y][:3]
                print(f"FAIL  {name}: value mismatch; first diffs: {diff}")
                ok = False
        if ok:
            print(f"OK    {name}: {len(rows)} rows  ({elapsed:.1f}s)")
        else:
            failures.append(name)

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        return 1
    print("all queries match")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
