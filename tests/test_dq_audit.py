"""dq_audit must actually FIRE: the driver testdata is clean (all 7 checks
pass with 0 violations), so this test plants one violation of every kind in
a scratch warehouse and asserts each check counts exactly its plant."""

from __future__ import annotations

import datetime as dt

from airflow_postgres_to_s3_pipeline_spark.operators import advanced


def _write(spark, path, name, rows, schema):
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(f"{path}/{name}.parquet")


def test_every_check_counts_its_planted_violation(spark, tmp_path):
    d = str(tmp_path)
    ts = dt.datetime(1995, 1, 1)
    _write(
        spark,
        d,
        "customer",
        [(1, "a"), (2, "b")],
        "c_custkey long, c_name string",
    )
    _write(
        spark,
        d,
        "orders",
        [
            (10, 1, 100.0, ts),
            (11, 2, -5.0, ts),   # nonpositive price
            (11, 2, 50.0, ts),   # duplicate orderkey
            (12, 99, 10.0, ts),  # orphan custkey
        ],
        "o_orderkey long, o_custkey long, o_totalprice double, o_orderdate timestamp",
    )
    _write(
        spark,
        d,
        "lineitem",
        [
            (10, 5.0, 0.1),
            (None, 5.0, 0.1),   # null orderkey (also orphan? NULL never
                                # matches an anti-join probe -> counts there
                                # too; pin that explicitly below)
            (10, 99.0, 0.1),    # quantity out of range
            (10, 5.0, 1.5),     # discount out of range
            (77, 5.0, 0.1),     # orphan orderkey
        ],
        "l_orderkey long, l_quantity double, l_discount double",
    )

    got = {
        r.check_name: (r.n_violations, r.passed)
        for r in advanced.dq_audit(spark, d).collect()
    }
    assert got["lineitem.l_orderkey_not_null"] == (1, False)
    assert got["lineitem.l_quantity_in_1_50"] == (1, False)
    assert got["lineitem.l_discount_in_0_1"] == (1, False)
    assert got["orders.o_totalprice_positive"] == (1, False)
    assert got["orders.o_orderkey_unique"] == (1, False)
    assert got["orders.o_custkey_refs_customer"] == (1, False)
    # the NULL-key row also fails the FK probe (NULL joins nothing)
    assert got["lineitem.l_orderkey_refs_orders"] == (2, False)


def test_clean_warehouse_passes_everything(spark, sf_dir):
    rows = advanced.dq_audit(spark, sf_dir).collect()
    assert len(rows) == 7
    assert all(r.passed and r.n_violations == 0 for r in rows)
