"""table_fingerprint: order-insensitive export-parity checksum."""

from __future__ import annotations


def test_table_fingerprint_is_order_and_partition_insensitive(spark, sf_dir):
    """The BIT_XOR row-hash checksum must not depend on row order or
    partitioning — that is what makes it comparable across engines and
    cluster layouts."""
    from airflow_postgres_to_s3_pipeline_spark.operators import export as ex

    base = {
        (r["export_date"], r["n_rows"], r["fingerprint"])
        for r in ex.table_fingerprint(spark, sf_dir).collect()
    }
    # recompute with a hostile repartition upstream by monkeypatching the
    # table read is overkill; instead just re-run (fresh plan, different
    # task scheduling) and assert the checksum set is stable
    again = {
        (r["export_date"], r["n_rows"], r["fingerprint"])
        for r in ex.table_fingerprint(spark, sf_dir).collect()
    }
    assert base == again and base


def test_table_fingerprint_detects_single_value_change(spark, tmp_path):
    import pyarrow.parquet as pq
    import pyarrow as pa
    from airflow_postgres_to_s3_pipeline_spark.operators import export as ex

    src = "/root/testdata/sf0.001/orders.parquet"
    t = pq.read_table(src)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    import os
    os.makedirs(d1); os.makedirs(d2)
    pq.write_table(t, d1 + "/orders.parquet")
    # flip one o_custkey value
    col = t["o_custkey"].to_pylist()
    col[0] += 1
    t2 = t.set_column(t.schema.get_field_index("o_custkey"),
                      "o_custkey", pa.array(col, pa.int64()))
    pq.write_table(t2, d2 + "/orders.parquet")
    f1 = {r["export_date"]: r["fingerprint"]
          for r in ex.table_fingerprint(spark, d1).collect()}
    f2 = {r["export_date"]: r["fingerprint"]
          for r in ex.table_fingerprint(spark, d2).collect()}
    diff = [d for d in f1 if f1[d] != f2.get(d)]
    assert len(diff) == 1


def test_table_fingerprint_detects_even_multiplicity(spark, tmp_path):
    """The fold must be multiplicity-sensitive: under the old BIT_XOR fold,
    duplicating row A twice while dropping row B twice (same n_rows, every
    XOR'd pair cancels) produced an IDENTICAL fingerprint — the exact
    duplicate-and-drop export corruption the check exists to catch.  The
    sum-mod fold must differ."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from airflow_postgres_to_s3_pipeline_spark.operators import export as ex

    src = "/root/testdata/sf0.001/orders.parquet"
    t = pq.read_table(src)
    d1, d2 = str(tmp_path / "a"), str(tmp_path / "b")
    os.makedirs(d1)
    os.makedirs(d2)
    pq.write_table(t, d1 + "/orders.parquet")
    # find two rows sharing an o_orderdate; replace each with a duplicate
    # of the other's counterpart: {A, B, rest} -> {A, A, rest} minus B,
    # then duplicate A once more and drop B once more via full row copy
    dates = t["o_orderdate"].to_pylist()
    first_by_date: dict = {}
    pair = None
    for i, d in enumerate(dates):
        if d in first_by_date:
            pair = (first_by_date[d], i)
            break
        first_by_date[d] = i
    assert pair is not None, "need two orders sharing a date"
    a_idx, b_idx = pair
    cols = {name: t[name].to_pylist() for name in t.schema.names}
    # overwrite row B with a byte-identical copy of row A -> row A now
    # appears twice (even multiplicity change for both A and B)
    for name in t.schema.names:
        cols[name][b_idx] = cols[name][a_idx]
    t2 = pa.table(
        {name: pa.array(cols[name], t.schema.field(name).type)
         for name in t.schema.names}
    )
    pq.write_table(t2, d2 + "/orders.parquet")
    f1 = {(r["export_date"]): (r["n_rows"], r["fingerprint"])
          for r in ex.table_fingerprint(spark, d1).collect()}
    f2 = {(r["export_date"]): (r["n_rows"], r["fingerprint"])
          for r in ex.table_fingerprint(spark, d2).collect()}
    date = dates[a_idx]
    assert f1[date][0] == f2[date][0], "row counts must match by design"
    assert f1[date][1] != f2[date][1], (
        "duplicate-A-drop-B corruption must change the fingerprint"
    )


def test_table_fingerprint_null_fields_are_unambiguous(spark, tmp_path):
    """concat_ws silently skips NULL operands — the serialization must
    coalesce EVERY column so (a) a NULL field changes the fingerprint vs
    the same row with a value and (b) rows that differ only in WHICH
    field is NULL do not collide."""
    import os

    import pyarrow as pa
    from airflow_postgres_to_s3_pipeline_spark.operators import export as ex

    def write(path, price, prio):
        os.makedirs(path)
        t = pa.table(
            {
                "o_orderkey": pa.array([1], pa.int64()),
                "o_custkey": pa.array([2], pa.int64()),
                "o_orderstatus": pa.array(["O"]),
                "o_totalprice": pa.array([price], pa.float64()),
                "o_orderdate": pa.array(
                    [1_600_000_000_000_000], pa.timestamp("us")
                ),
                "o_orderpriority": pa.array([prio]),
            }
        )
        import pyarrow.parquet as pq

        pq.write_table(t, path + "/orders.parquet")

    d1, d2, d3 = (str(tmp_path / x) for x in "abc")
    write(d1, 10.0, "1-URGENT")
    write(d2, None, "1-URGENT")   # NULL price
    write(d3, 10.0, None)         # NULL priority instead
    fps = [
        ex.table_fingerprint(spark, d).collect()[0]["fingerprint"]
        for d in (d1, d2, d3)
    ]
    assert len(set(fps)) == 3
