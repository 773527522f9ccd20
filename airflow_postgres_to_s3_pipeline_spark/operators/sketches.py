"""Sketch aggregations (SURVEY.md §2B E9 approximate tier).

Sketches are the 100 TB answer to distinct-count and heavy-hitter questions:
fixed-size state, partial-mergeable (one map-side sketch per partition, one
merge), re-usable across queries when persisted.

- ``hll_sketch_users``: Apache DataSketches HLL via the built-in
  ``hll_sketch_agg`` / ``hll_sketch_estimate`` — mergeable distinct-count
  state (unlike ``approx_count_distinct`` the sketch itself is a column you
  can store and union later).  Rows-only check (estimates are
  approximate by design); accuracy vs the exact count is pinned in
  tests/test_sketches.py.
- ``heavy_hitters_terms``: exact heavy hitters (terms above a frequency
  threshold) as a two-shuffle aggregate with a full SQL oracle — the exact
  baseline a Count-Min/Misra-Gries sketch approximates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table

ORACLES: dict[str, str] = {}


def _oracle(name: str, sql: str):
    ORACLES[name] = sql


def hll_sketch_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event type via mergeable HLL sketches, plus the
    global distinct estimate from unioning the per-type sketches — the
    two-level pattern (store per-shard sketches, merge on demand) that
    replaces re-scanning 100 TB for every distinct question.

    HLL estimates are implementation-specific, so the estimate itself is not
    oracle-compared; instead the bound check happens engine-side (estimate
    within 10% of the exact distinct count — default lgConfigK=12 gives
    ~1.6% rsd) and the oracle verifies the exact counts plus
    ``est_ok = true``.  The exact countDistinct exists only for this
    harness check.
    """
    e = table(spark, sf_dir, "events")
    per_type = e.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.countDistinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    )
    per_type_est = per_type.select(
        "event_type",
        F.hll_sketch_estimate("sketch").alias("_est"),
        "exact_users",
        "n_events",
    )
    global_est = per_type.agg(
        F.lit("ALL").alias("event_type"),
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("_est"),
        F.lit(None).cast("long").alias("exact_users"),
        F.sum("n_events").alias("n_events"),
    )
    global_exact = e.agg(F.countDistinct("user_id").alias("_g_exact"))
    global_est = (
        global_est.crossJoin(F.broadcast(global_exact))
        .select(
            "event_type",
            "_est",
            F.col("_g_exact").alias("exact_users"),
            "n_events",
        )
    )
    return (
        per_type_est.unionByName(global_est)
        .select(
            "event_type",
            "n_events",
            "exact_users",
            (
                F.abs(F.col("_est") - F.col("exact_users"))
                <= F.lit(0.10) * F.col("exact_users")
            ).alias("est_ok"),
        )
    )


_oracle(
    "hll_sketch_users",
    """
    SELECT event_type, COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_users, TRUE AS est_ok
    FROM events
    GROUP BY event_type
    UNION ALL
    SELECT 'ALL', COUNT(*), COUNT(DISTINCT user_id), TRUE
    FROM events
    """,
)


def bitmap_distinct_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct customers per order status via bitmap aggregation
    (Spark 3.5 ``bitmap_*``): keys bucket into fixed 32k-bit bitmaps,
    partials OR-merge — exact distinct counting with mergeable state, the
    middle ground between COUNT(DISTINCT)'s full shuffle-dedup and HLL's
    approximation.  Oracle: plain COUNT(DISTINCT) — results must be equal
    because bitmaps are exact."""
    e = table(spark, sf_dir, "orders")
    per_bucket = (
        e.select(
            "o_orderstatus",
            F.expr("bitmap_bucket_number(o_custkey)").alias("bucket"),
            F.expr("bitmap_bit_position(o_custkey)").alias("pos"),
        )
        .groupBy("o_orderstatus", "bucket")
        .agg(F.expr("bitmap_construct_agg(pos)").alias("bitmap"))
    )
    return (
        per_bucket.groupBy("o_orderstatus")
        .agg(
            F.sum(F.expr("bitmap_count(bitmap)")).alias("distinct_customers")
        )
    )


_oracle(
    "bitmap_distinct_orders",
    """
    SELECT o_orderstatus, COUNT(DISTINCT o_custkey) AS distinct_customers
    FROM orders
    GROUP BY o_orderstatus
    """,
)


HEAVY_HITTERS_PPM = 2000
"""Shared threshold, interpolated into the oracle below — the module's
constant-sharing convention (APPROX_TOPK_K) — so a caller overriding
``threshold_ppm`` cannot silently compare against a 2000-ppm oracle
(r10 review)."""


def heavy_hitters_terms(spark: SparkSession, sf_dir: str,
                        threshold_ppm: int = HEAVY_HITTERS_PPM) -> DataFrame:
    """Exact heavy hitters: words above threshold_ppm parts-per-million of
    total corpus tokens.  Two shuffles (term count + scalar total broadcast);
    the sketch path (Count-Min) approximates exactly this output.  The
    registered oracle is generated at HEAVY_HITTERS_PPM — re-register via
    ``_heavy_hitters_oracle(ppm)`` when calling with another threshold."""
    d = table(spark, sf_dir, "documents")
    tokens = d.select(F.explode(F.split("text", " ")).alias("term")).filter(
        F.length("term") > 0
    )
    counts = tokens.groupBy("term").agg(F.count(F.lit(1)).alias("freq"))
    total = tokens.agg(F.count(F.lit(1)).alias("_total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .filter(F.col("freq") * 1_000_000 >= F.lit(threshold_ppm) * F.col("_total"))
        .select(
            "term",
            "freq",
            (F.col("freq") * 1_000_000 / F.col("_total")).alias("ppm"),
        )
    )


def _heavy_hitters_oracle(threshold_ppm: int = HEAVY_HITTERS_PPM) -> str:
    return f"""
    WITH tokens AS (
        SELECT UNNEST(string_split(text, ' ')) AS term FROM documents
    ), t2 AS (
        SELECT term FROM tokens WHERE LENGTH(term) > 0
    ), counts AS (
        SELECT term, COUNT(*) AS freq FROM t2 GROUP BY term
    ), total AS (
        SELECT COUNT(*) AS total FROM t2
    )
    SELECT term, freq, freq * 1000000 / CAST(total AS DOUBLE) AS ppm
    FROM counts, total
    WHERE freq * 1000000 >= {threshold_ppm} * total
    """


_oracle("heavy_hitters_terms", _heavy_hitters_oracle())


APPROX_TOPK_K = 8


def approx_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy hitters via the ``approx_top_k`` sketch aggregate (Spark
    4.1): one fixed-size mergeable sketch per partition, merged once — the
    sketch answer to "top terms over 100 TB" that ``heavy_hitters_terms``
    is the exact baseline for.

    Item ORDER among equal counts is sketch-internal, so the contract
    checked is item-order-free: the emitted rows are the top-k COUNTS
    (descending — deterministic regardless of which tied item holds the
    slot) plus an engine-side boolean that each sketched item's count
    equals that item's exact corpus count (true whenever maxItemsTracked
    covers the vocabulary, as here).  The oracle recomputes the exact
    top-k count ladder and emits ``count_exact = true``.
    """
    d = table(spark, sf_dir, "documents")
    words = (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
    )
    sketch = words.agg(
        F.expr(f"approx_top_k(word, {APPROX_TOPK_K})").alias("tk")
    )
    topk = sketch.select(
        F.explode("tk").alias("entry")
    ).select(
        F.col("entry.item").alias("_item"),
        F.col("entry.count").alias("approx_count"),
    )
    exact = words.groupBy("word").agg(F.count(F.lit(1)).alias("_exact"))
    joined = topk.join(exact, topk["_item"] == exact["word"], "left")
    w = Window.orderBy(F.col("approx_count").desc(), F.col("_item").asc())
    return joined.select(
        F.row_number().over(w).alias("rnk"),
        "approx_count",
        (F.col("approx_count") == F.col("_exact")).alias("count_exact"),
    )


_oracle(
    "approx_topk_terms",
    f"""
    WITH words AS (
        SELECT unnest(string_split(text, ' ')) AS word FROM documents
    ), counts AS (
        SELECT word, COUNT(*) AS c FROM words
        WHERE LENGTH(word) > 0 GROUP BY word
    ), ladder AS (
        SELECT c FROM counts ORDER BY c DESC, word ASC LIMIT {APPROX_TOPK_K}
    )
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY c DESC) AS INTEGER) AS rnk,
           c AS approx_count,
           true AS count_exact
    FROM ladder
    """,
)
