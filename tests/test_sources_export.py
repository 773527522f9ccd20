"""Source connectors + the public export operator."""

from __future__ import annotations

import glob
import http.server
import os
import threading

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators.export import QueryToStorageOperator
from airflow_postgres_to_s3_pipeline_spark.sources import readers


def test_http_download_with_partial_failure(tmp_path):
    """S1 parity: lands available snapshots, skips missing ones (the
    reference's non-200 -> log-and-skip behavior)."""
    served = tmp_path / "served"
    served.mkdir()
    (served / "listing-2024-01-01.csv").write_text("id\n1\n")

    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(served), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        port = srv.server_address[1]
        landed = readers.download_snapshots(
            f"http://127.0.0.1:{port}/listing-{{date}}.csv",
            ["2024-01-01", "2024-02-01"],  # second one is missing -> skipped
            str(tmp_path / "dl"),
        )
    finally:
        srv.shutdown()
    assert len(landed) == 1
    assert landed[0].endswith("listing-2024-01-01.csv")
    assert open(landed[0]).read() == "id\n1\n"


def test_json_source_roundtrip(spark, tmp_path):
    out = os.path.join(str(tmp_path), "j")
    df = spark.range(5).select(
        F.col("id"), (F.col("id") * 2).alias("dbl"), F.lit("x").alias("tag")
    )
    df.write.json(out)
    back = readers.read_json(spark, out)
    assert back.count() == 5
    assert set(back.columns) == {"id", "dbl", "tag"}


def test_csv_failfast_rejects_bad_rows(spark, tmp_path):
    """FAILFAST reproduces the reference's hard COPY errors on bad numerics
    (README.md:148-151)."""
    import pytest
    from pyspark.sql.types import IntegerType, StructField, StructType

    p = os.path.join(str(tmp_path), "bad.csv")
    with open(p, "w") as f:
        f.write("a\n1\nnot_a_number\n")
    schema = StructType([StructField("a", IntegerType())])
    with pytest.raises(Exception):
        readers.read_csv(spark, p, schema=schema, mode="FAILFAST").collect()
    # PERMISSIVE is the lenient upgrade: bad cell -> null
    ok = readers.read_csv(spark, p, schema=schema, mode="PERMISSIVE").collect()
    assert sorted([r["a"] for r in ok], key=lambda x: (x is None, x)) == [1, None]


def test_query_to_storage_operator(spark, sf_dir, tmp_path):
    """O2 parity: arbitrary SQL + {ds}-templated key -> distributed export."""
    op = QueryToStorageOperator(
        query=(
            "SELECT o_orderstatus, count(*) AS n FROM orders "
            "WHERE o_orderdate < TIMESTAMP '{ds}' GROUP BY o_orderstatus"
        ),
        out_base=str(tmp_path),
        out_key="orders_{ds}.csv",
        tables={"orders": table(spark, sf_dir, "orders")},
    )
    out_path = op.execute(spark, ds="2000-01-01")
    assert out_path.endswith("orders_2000-01-01.csv")
    parts = glob.glob(os.path.join(out_path, "part-*.csv"))
    assert parts
    content = "".join(open(p).read() for p in parts)
    assert content.startswith("o_orderstatus,n") or "o_orderstatus" in content


def test_query_to_storage_operator_brace_query(spark, sf_dir, tmp_path):
    """Literal braces in the SQL (regex quantifiers, map literals) must
    survive templating — only the {ds} token is substituted.  str.format
    would raise KeyError/IndexError here, narrowing the declared
    arbitrary-SQL surface."""
    op = QueryToStorageOperator(
        query=(
            "SELECT o_orderstatus, count(*) AS n FROM orders "
            "WHERE o_orderstatus RLIKE '^[A-Z]{1}$' "
            "AND o_orderdate < TIMESTAMP '{ds}' "
            "GROUP BY o_orderstatus"
        ),
        out_base=str(tmp_path),
        out_key="braces_{ds}.csv",
        tables={"orders": table(spark, sf_dir, "orders")},
    )
    out_path = op.execute(spark, ds="2000-01-01")
    assert out_path.endswith("braces_2000-01-01.csv")
    parts = glob.glob(os.path.join(out_path, "part-*.csv"))
    assert parts


def test_orc_source_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC round-trip preserves rows/schema and pushes filters + prunes
    columns at the scan, like parquet."""
    from airflow_postgres_to_s3_pipeline_spark.catalog import table
    from airflow_postgres_to_s3_pipeline_spark.plans import (
        explain_str,
        pushed_filters,
    )

    out = str(tmp_path / "orders_orc")
    o = table(spark, sf_dir, "orders")
    o.write.format("orc").mode("overwrite").save(out)
    back = readers.read_orc(spark, out)
    assert back.count() == o.count()
    assert set(back.columns) == set(o.columns)
    q = back.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    assert "o_orderstatus" in " ".join(pushed_filters(q))
    plan = explain_str(q)
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "o_totalprice" not in read_schema


def test_xml_source_roundtrip(spark, tmp_path):
    """Native XML datasource (Spark 4): schema'd write -> read round-trip
    preserves values; explicit schema avoids the inference pass."""
    from pyspark.sql.types import (
        LongType, StringType, StructField, StructType,
    )

    from airflow_postgres_to_s3_pipeline_spark.sources.readers import read_xml

    df = spark.range(20).selectExpr(
        "id", "concat('name_', id) AS name", "CAST(id * 1.5 AS DOUBLE) AS score"
    )
    path = str(tmp_path / "xml_roundtrip")
    df.write.format("xml").option("rowTag", "rec").save(path)
    schema = StructType([
        StructField("id", LongType()),
        StructField("name", StringType()),
    ])
    back = read_xml(spark, path, row_tag="rec", schema=schema)
    assert back.schema == schema, "explicit schema not honored (pruning)"
    got = {(r["id"], r["name"]) for r in back.collect()}
    exp = {(r["id"], r["name"]) for r in df.select("id", "name").collect()}
    assert got == exp


def test_text_source_line_and_wholetext(spark, tmp_path):
    from airflow_postgres_to_s3_pipeline_spark.sources.readers import read_text

    p = tmp_path / "docs"
    p.mkdir()
    (p / "a.txt").write_text("line1\nline2\n")
    (p / "b.txt").write_text("solo\n")
    lines = read_text(spark, str(p))
    assert sorted(r["value"] for r in lines.collect()) == [
        "line1", "line2", "solo",
    ]
    whole = read_text(spark, str(p), whole_text=True)
    assert whole.count() == 2
    assert {r["value"] for r in whole.collect()} == {"line1\nline2\n", "solo\n"}
