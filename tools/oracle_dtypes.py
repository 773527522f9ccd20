"""Type-level oracle audit: Spark schema vs DuckDB DESCRIBE of the oracle SQL.

The driver's correctness gate hashes TYPED values, so a DuckDB column whose
VALUE REPRESENTATION differs from Spark's (HUGEINT from an uncast SUM becomes
``Decimal`` through Arrow, vs Spark BIGINT's ``int``) fails the driver even
though ``fetchall()`` values compare equal.  r13 shipped with exactly that bug
in ``vocab_growth_curve``.  This tool plans (does not run) every oracle with
``DESCRIBE`` and diffs the column types against the Spark DataFrame schema.

Calibrated against driver history: integer-width differences (Spark INTEGER
vs DuckDB BIGINT) have passed the driver's hash in every round they appeared
(embedding_dim_stats, recursive_cte_order_chains, price_histogram,
fuzzy_match_*, tfidf_ml_features — all hash_match=true), so widths inside the
signed-integer family are normalized; what IS flagged is anything that changes
the fetched value's type/representation: HUGEINT or DECIMAL where an integer
is expected, a DECIMAL scale mismatch (Decimal('1.4') vs Decimal('1.40')),
FLOAT vs DOUBLE, and any cross-family mismatch.

    python tools/oracle_dtypes.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def spark_to_duck(dt) -> str:
    """Expected DuckDB type string for a Spark DataType, normalized to the
    representation family the driver's typed hash distinguishes (all signed
    integer widths collapse to INT; decimal precision is dropped, scale kept).
    """
    from pyspark.sql import types as T

    if isinstance(dt, (T.LongType, T.IntegerType, T.ShortType, T.ByteType)):
        return "INT"
    if isinstance(dt, T.DoubleType):
        return "DOUBLE"
    if isinstance(dt, T.FloatType):
        return "FLOAT"
    if isinstance(dt, T.StringType):
        return "VARCHAR"
    if isinstance(dt, T.BooleanType):
        return "BOOLEAN"
    if isinstance(dt, T.DateType):
        return "DATE"
    if isinstance(dt, T.TimestampType):
        return "TIMESTAMP"
    if isinstance(dt, T.TimestampNTZType):
        return "TIMESTAMP"
    if isinstance(dt, T.BinaryType):
        return "BLOB"
    if isinstance(dt, T.DecimalType):
        return f"DECIMAL(*,{dt.scale})"
    if isinstance(dt, T.ArrayType):
        return spark_to_duck(dt.elementType) + "[]"
    if isinstance(dt, T.MapType):
        return f"MAP({spark_to_duck(dt.keyType)}, {spark_to_duck(dt.valueType)})"
    if isinstance(dt, T.StructType):
        inner = ", ".join(
            f'"{f.name}" {spark_to_duck(f.dataType)}' for f in dt.fields
        )
        return f"STRUCT({inner})"
    return f"<unmapped:{dt.simpleString()}>"


_INT_WIDTHS = re.compile(r"\b(?:TINYINT|SMALLINT|INTEGER|BIGINT)\b")
_DEC_PREC = re.compile(r"DECIMAL\(\d+,(\d+)\)")


def normalize_duck(dtype: str) -> str:
    """Collapse a DuckDB DESCRIBE type string to the same families.

    HUGEINT/UHUGEINT deliberately do NOT collapse to INT — through Arrow they
    surface as Decimal and fail the driver's typed hash against an int column.
    """
    dtype = _INT_WIDTHS.sub("INT", dtype)
    dtype = _DEC_PREC.sub(lambda m: f"DECIMAL(*,{m.group(1)})", dtype)
    return dtype


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from airflow_postgres_to_s3_pipeline_spark.session import get_spark

    spark = get_spark(shuffle_partitions=4)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = e.queries()
    oracles = e.oracle_sql()
    n_checked = 0
    bad = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        if name not in oracles:
            continue
        try:
            schema = {f.name: f.dataType for f in fn(spark, sf_dir).schema.fields}
        except Exception as ex:  # pragma: no cover - schema build failure
            print(f"ERR   {name}: spark schema failed: {ex}")
            bad.append(name)
            continue
        try:
            desc = con.execute(f"DESCRIBE {oracles[name]}").fetchall()
        except Exception as ex:  # pragma: no cover - oracle plan failure
            print(f"ERR   {name}: duckdb describe failed: {ex}")
            bad.append(name)
            continue
        n_checked += 1
        mism = []
        for col, dtype, *_ in desc:
            if col not in schema:
                mism.append(f"{col}: duckdb-only column")
                continue
            want = spark_to_duck(schema[col])
            got = normalize_duck(dtype)
            if got != want:
                mism.append(f"{col}: spark={want} duckdb={dtype}")
        if mism:
            print(f"TYPE  {name}: " + "; ".join(mism))
            bad.append(name)

    print()
    print(f"{n_checked} oracles type-checked")
    if bad:
        print(f"{len(bad)} with type divergence: {bad}")
        return 1
    print("all oracle types match spark schemas")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
