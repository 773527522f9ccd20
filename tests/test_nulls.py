"""Null-semantics robustness: the driver testdata is null-free, so these
plant nulls and pin the engine's behavior on every path that must survive
them (joins, aggregates, windows, dedup, set ops)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F


def _df(spark):
    rows = [
        (1, "a", 10.0),
        (2, "a", None),
        (3, None, 30.0),
        (4, "b", None),
        (5, None, None),
    ]
    return spark.createDataFrame(rows, "id bigint, k string, v double")


def test_agg_null_semantics(spark):
    r = (
        _df(spark)
        .agg(
            F.count("*").alias("n_rows"),
            F.count("v").alias("n_v"),
            F.sum("v").alias("sum_v"),
            F.avg("v").alias("avg_v"),
            F.countDistinct("k").alias("nd_k"),
        )
        .collect()[0]
    )
    assert r["n_rows"] == 5
    assert r["n_v"] == 2          # count(col) skips nulls
    assert r["sum_v"] == 40.0
    assert r["avg_v"] == 20.0     # avg over non-null only
    assert r["nd_k"] == 2         # distinct ignores null


def test_groupby_keeps_null_key_group(spark):
    rows = {r["k"]: r["n"] for r in _df(spark).groupBy("k").agg(
        F.count(F.lit(1)).alias("n")).collect()}
    assert rows[None] == 2        # null keys form one group


def test_join_null_keys_never_match(spark):
    a = _df(spark).select("id", "k")
    b = _df(spark).select(F.col("k").alias("k"), F.lit(1).alias("tag")).distinct()
    inner = a.join(b, "k").count()
    # only the 3 rows with non-null k can match (null != null in joins)
    assert inner == 3


def test_outer_join_null_fill_and_coalesce(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y")], "id bigint, l string")
    b = spark.createDataFrame([(2, "B"), (3, "C")], "id bigint, r string")
    rows = {
        r["id"]: (r["l"], r["r"], r["both"])
        for r in a.join(b, "id", "full_outer")
        .select("id", "l", "r", F.coalesce("l", "r").alias("both"))
        .collect()
    }
    assert rows[1] == ("x", None, "x")
    assert rows[2] == ("y", "B", "y")
    assert rows[3] == (None, "C", "C")


def test_window_null_ordering_and_lag(spark):
    w = Window.partitionBy("k").orderBy(F.col("v").asc_nulls_last(), "id")
    rows = (
        _df(spark)
        .filter(F.col("k") == "a")
        .select("id", "v", F.lag("v").over(w).alias("prev"))
        .orderBy("id")
        .collect()
    )
    # v=10 sorts before v=null (nulls last); lag propagates the null
    assert [r["id"] for r in rows] == [1, 2]
    assert rows[0]["prev"] is None and rows[1]["prev"] == 10.0


def test_dropduplicates_treats_nulls_equal(spark):
    df = spark.createDataFrame(
        [(None, 1.0), (None, 1.0), ("a", None), ("a", None)],
        "k string, v double",
    )
    assert df.dropDuplicates(["k", "v"]).count() == 2


def test_set_ops_null_equality(spark):
    a = spark.createDataFrame([(None,), ("x",)], "k string")
    b = spark.createDataFrame([(None,), ("y",)], "k string")
    # intersect/except use null-safe grouping semantics (null == null)
    assert a.intersect(b).count() == 1
    assert a.exceptAll(b).collect()[0]["k"] == "x"


def test_null_safe_equality_operator(spark):
    df = spark.createDataFrame([(None, None), (None, "x"), ("x", "x")],
                               "a string, b string")
    got = df.select(F.col("a").eqNullSafe(F.col("b")).alias("eq")).collect()
    assert [r["eq"] for r in got] == [True, False, True]


def test_bm25_doc_stats_null_text_contributes_zero_dl(spark):
    """r13 ADVICE: F.split(NULL) -> NULL and F.size(NULL) = -1, so a
    NULL-text doc fed dl=-1 into the BM25 collection stats and biased
    avgdl; the pre-r13 explode chain produced no token rows for such
    docs.  The null-guard must give dl=0 / tf=0 (the same aggregate
    contribution as the old chain) and keep the doc out of the ranked
    output (no query-term hits)."""
    from airflow_postgres_to_s3_pipeline_spark.operators.text import (
        _bm25_doc_stats,
        _bm25_rank,
    )

    d = spark.createDataFrame(
        [(1, "join filter stream"), (2, None), (3, "")],
        "doc_id bigint, text string",
    )
    stats = {r["doc_id"]: r.asDict() for r in _bm25_doc_stats(d).collect()}
    assert stats[2]["dl"] == 0 and stats[3]["dl"] == 0
    assert stats[2]["tf0"] == 0
    assert stats[1]["dl"] == 3
    ranked = _bm25_rank(_bm25_doc_stats(d)).collect()
    assert [r["doc_id"] for r in ranked] == [1]
