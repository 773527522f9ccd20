"""apply_in_pandas_zscore: exact-moment determinism and degenerate groups.

The oracle gate (tools/check_oracles.py) pins cross-engine parity on the
real corpus; these tests pin the edges a corpus may not contain — the
1-row group and the zero-variance group, which the pre-r10 pandas
mean/std implementation turned into NaN (vs the oracle's NULL)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def _zscore_frame(spark, rows):
    df = spark.createDataFrame(rows, "c_custkey long, c_mktsegment string,"
                                     " c_acctbal decimal(15,2)")
    # drive the registry implementation through a temp parquet dir so the
    # operator's table() read path is exercised unchanged
    return df


def test_zscore_degenerate_groups_yield_null(spark, tmp_path):
    import decimal

    from airflow_postgres_to_s3_pipeline_spark.operators import udfs

    d = str(tmp_path)
    rows = [
        # 1-row segment: n < 2 -> NULL (pandas std(ddof=1) gave NaN before)
        (1, "SOLO", decimal.Decimal("100.00")),
        # zero-variance segment: D == 0 -> NULL
        (2, "FLAT", decimal.Decimal("55.25")),
        (3, "FLAT", decimal.Decimal("55.25")),
        # healthy segment
        (4, "OK", decimal.Decimal("10.00")),
        (5, "OK", decimal.Decimal("20.00")),
        (6, "OK", decimal.Decimal("30.00")),
    ]
    _zscore_frame(spark, rows).write.mode("overwrite").parquet(
        d + "/customer.parquet"
    )
    out = {
        r["c_custkey"]: r["z_micro"]
        for r in udfs.apply_in_pandas_zscore(spark, d).collect()
    }
    assert out[1] is None
    assert out[2] is None and out[3] is None
    # exact expected values: cents 1000/2000/3000, mean 2000, std 1000
    # z = -1, 0, 1 -> floor(z * 1e4)
    assert (out[4], out[5], out[6]) == (-10000, 0, 10000)


def test_zscore_matches_exact_integer_formula(spark, sf_dir):
    """Spot-check the operator against an independently computed exact
    formula on the real corpus (one segment), including the float op
    order: z = (A/n) / sqrt(D/m) * 1e4, floored."""
    from airflow_postgres_to_s3_pipeline_spark.catalog import table
    from airflow_postgres_to_s3_pipeline_spark.operators import udfs

    seg = "BUILDING"
    got = {
        r["c_custkey"]: r["z_micro"]
        for r in udfs.apply_in_pandas_zscore(spark, sf_dir)
        .filter(F.col("c_mktsegment") == seg)
        .collect()
    }
    rows = (
        table(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == seg)
        .select("c_custkey", "c_acctbal")
        .collect()
    )
    cents = {r["c_custkey"]: int(r["c_acctbal"] * 100) for r in rows}
    n = len(cents)
    s = sum(cents.values())
    q = sum(v * v for v in cents.values())
    d_ = q * n - s * s
    denom = math.sqrt(float(d_) / float(n * (n - 1)))
    for k, x in cents.items():
        expect = math.floor((float(x * n - s) / float(n)) / denom * 10000.0)
        assert got[k] == expect
