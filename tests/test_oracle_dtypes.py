"""The typed-hash oracle guard (tools/oracle_dtypes.py).

The driver hashes TYPED values: a DuckDB HUGEINT (what SUM(BIGINT) returns
uncast) surfaces as Decimal through Arrow and fails against a Spark BIGINT
column even when every value is equal — the r13 ``vocab_growth_curve``
regression.  ``fetchall()``-based value comparison can never catch it, so the
gate now DESCRIBEs each oracle and compares normalized type families.  These
tests pin the calibration: widths inside the signed-integer family pass (the
driver accepted INTEGER-vs-BIGINT in every round it saw one), HUGEINT and
decimal-scale divergence fail.
"""

from __future__ import annotations

import os
import sys

import duckdb
from pyspark.sql import types as T

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(__file__)), "tools"))

from oracle_dtypes import normalize_duck, spark_to_duck  # noqa: E402


def duck_type(sql: str) -> str:
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT 1::BIGINT AS x, 1.50::DECIMAL(12,2) AS d")
    (_, dtype, *_), = con.execute(f"DESCRIBE {sql}").fetchall()
    return dtype


def test_uncast_sum_of_bigint_is_flagged():
    # SUM(BIGINT) is HUGEINT in DuckDB; Spark's sum(long) stays long.
    dtype = duck_type("SELECT SUM(x) AS s FROM t")
    assert dtype == "HUGEINT"
    assert normalize_duck(dtype) != spark_to_duck(T.LongType())


def test_cast_sum_matches_spark_long():
    dtype = duck_type("SELECT CAST(SUM(x) AS BIGINT) AS s FROM t")
    assert normalize_duck(dtype) == spark_to_duck(T.LongType())


def test_integer_width_differences_are_tolerated():
    # Driver-calibrated: Spark INTEGER vs DuckDB BIGINT passed the typed
    # hash in every round it appeared (both fetch as Python int).
    assert normalize_duck("BIGINT") == spark_to_duck(T.IntegerType())
    assert normalize_duck("SMALLINT") == spark_to_duck(T.LongType())


def test_decimal_precision_tolerated_scale_flagged():
    # DuckDB SUM(DECIMAL(12,2)) -> DECIMAL(38,2); Spark -> DECIMAL(22,2).
    # Same scale, different precision: same Decimal repr, passes.
    dtype = duck_type("SELECT SUM(d) AS s FROM t")
    assert dtype == "DECIMAL(38,2)"
    assert normalize_duck(dtype) == spark_to_duck(T.DecimalType(22, 2))
    # Scale change alters the repr (Decimal('1.50') vs Decimal('1.500')).
    assert normalize_duck("DECIMAL(38,3)") != spark_to_duck(T.DecimalType(22, 2))


def test_float_width_is_flagged():
    assert normalize_duck("FLOAT") != spark_to_duck(T.DoubleType())
    assert normalize_duck("DOUBLE") == spark_to_duck(T.DoubleType())


def test_nested_integer_widths_normalize():
    assert normalize_duck("BIGINT[]") == spark_to_duck(T.ArrayType(T.IntegerType()))
