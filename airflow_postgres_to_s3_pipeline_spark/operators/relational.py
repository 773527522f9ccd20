"""Relational core: projections, filters, joins, aggregates, sorts, set ops.

Covers SURVEY.md §2A Q1-Q3 (the reference's own query surface — projection +
filter + export, dags/airbnb_postgres_to_s3.py:149) and §2B E2-E14.  Every
query here is a pure DataFrame expression: Catalyst does predicate pushdown,
column pruning and join planning; AQE picks shuffle vs broadcast at runtime.

Scale notes (100 TB):
- Dimension tables (region/nation/part/supplier) are explicitly
  ``F.broadcast`` so the fact-side scan never shuffles for them.
- Fact-fact joins (orders x lineitem, customer x orders) are shuffle
  hash/sort-merge joins on their keys; with AQE skew-join splitting enabled
  a hot key is split automatically.
- Aggregates use partial (map-side) aggregation for free via ``groupBy``;
  exact-decimal sums (functions.numeric) keep results deterministic under
  any partitioning.

Each ``ORACLES`` entry is the DuckDB-ANSI mirror with identical column
aliases and types (see tools/check_oracles.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.functions.numeric import dsum

ORACLES: dict[str, str] = {}


def _oracle(name: str, sql: str):
    ORACLES[name] = sql


# ---------------------------------------------------------------------------
# Q1+Q2 parity: projection + filter export query
# (reference: SELECT * FROM listings WHERE load_date = CURRENT_DATE,
#  dags/airbnb_postgres_to_s3.py:149 — here over the orders batch table)
# ---------------------------------------------------------------------------

def export_projection_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT * with an equality+range batch predicate.

    On a date-partitioned table this filter becomes partition pruning; on raw
    parquet it is pushed to the scan (PushedFilters in explain).
    """
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") == "F")
        & (F.col("o_orderdate") >= F.lit("1998-01-01").cast("timestamp"))
    )


_oracle(
    "export_projection_filter",
    """
    SELECT * FROM orders
    WHERE o_orderstatus = 'F' AND o_orderdate >= TIMESTAMP '1998-01-01'
    """,
)


# ---------------------------------------------------------------------------
# E2: projection / computed columns
# ---------------------------------------------------------------------------

def computed_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    # No rounding: identical IEEE arithmetic on both engines yields identical
    # bits; rounding would *introduce* cross-engine tie divergence.
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (
            F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax"))
        ).alias("net_charge"),
        (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_price"),
        (F.col("l_quantity") > 25).alias("is_bulk"),
    )


_oracle(
    "computed_projection",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS net_charge,
           l_extendedprice / l_quantity AS unit_price,
           l_quantity > 25 AS is_bulk
    FROM lineitem
    """,
)


# ---------------------------------------------------------------------------
# E3: compound filters (equality, range, IN, LIKE, IS NULL, boolean algebra)
# ---------------------------------------------------------------------------

def filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
        & F.col("o_totalprice").between(50000.0, 200000.0)
        & (F.col("o_orderstatus") != "P")
        & F.col("o_orderdate").isNotNull()
        & F.col("o_orderpriority").like("%H%")
    ).select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


_oracle(
    "filter_compound",
    """
    SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
      AND o_totalprice BETWEEN 50000.0 AND 200000.0
      AND o_orderstatus <> 'P'
      AND o_orderdate IS NOT NULL
      AND o_orderpriority LIKE '%H%'
    """,
)


# ---------------------------------------------------------------------------
# E8: hash aggregate — the flagship TPC-H-Q1-style pricing summary
# ---------------------------------------------------------------------------

def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape) over lineitem.

    Map-side partial aggregation + single shuffle on the 2-key group; exact
    decimal sums keep output deterministic at any partition count.
    """
    # Products of 2-decimal prices/rates have exactly 4-6 decimal digits, so
    # decimal(27,6) casts are exact (no tie rounding); averages reuse the
    # exact sums so the division is bit-identical on both engines.
    l = table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    n = F.count(F.lit(1))
    return (
        l.filter(F.col("l_shipdate") <= F.lit("2000-12-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", 2).alias("sum_qty"),
            dsum("l_extendedprice", 2).alias("sum_base_price"),
            dsum(disc_price, 6).alias("sum_disc_price"),
            dsum(charge, 6).alias("sum_charge"),
            (dsum("l_quantity", 2) / n).alias("avg_qty"),
            (dsum("l_extendedprice", 2) / n).alias("avg_price"),
            (dsum("l_discount", 4) / n).alias("avg_disc"),
            n.alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


_oracle(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(27,6))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-12-01'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)


# ---------------------------------------------------------------------------
# E4: inner equi-joins — broadcast (dims) and shuffle (fact-fact)
# ---------------------------------------------------------------------------

def join_broadcast_dims(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per part brand: fact scan + two broadcast dimension joins.

    ``F.broadcast`` pins the join strategy so the 100 TB lineitem scan never
    shuffles; only the final small group-by aggregates exchange data.
    """
    l = table(spark, sf_dir, "lineitem")
    p = table(spark, sf_dir, "part")
    s = table(spark, sf_dir, "supplier")
    revenue = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(s), l.l_suppkey == s.s_suppkey)
        .groupBy("p_brand", "s_name")
        .agg(
            dsum(revenue, 6).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_oracle(
    "join_broadcast_dims",
    """
    SELECT p_brand, s_name,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(27,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN supplier ON l_suppkey = s_suppkey
    GROUP BY p_brand, s_name
    """,
)


def join_shuffle_multiway(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue rollup across region -> nation -> customer -> orders.

    customer x orders is a shuffle join on custkey; region/nation are
    broadcast.  AQE may demote the shuffle to broadcast at small SF — both
    plans are correct, the hint only *allows* broadcast for the dims.
    """
    r = table(spark, sf_dir, "region")
    n = table(spark, sf_dir, "nation")
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name", "n_name")
        .agg(
            dsum("o_totalprice", 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


_oracle(
    "join_shuffle_multiway",
    """
    SELECT r_name, n_name,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey
    GROUP BY r_name, n_name
    """,
)


# ---------------------------------------------------------------------------
# E5: outer joins
# ---------------------------------------------------------------------------

def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order stats keeping zero-order customers (left outer)."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice", 2), F.lit(0.0)).alias("spend"),
        )
    )


_oracle(
    "join_left_outer",
    """
    SELECT c_custkey, c_mktsegment,
           COUNT(o_orderkey) AS n_orders,
           COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE), 0.0) AS spend
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_mktsegment
    """,
)


def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of per-status order counts vs a static status dim."""
    o = table(spark, sf_dir, "orders")
    counts = o.groupBy("o_orderstatus").agg(F.count(F.lit(1)).alias("n_orders"))
    statuses = spark.createDataFrame(
        [("F",), ("O",), ("P",), ("X",)], ["status"]
    )
    return (
        statuses.join(counts, statuses.status == counts.o_orderstatus, "full_outer")
        .select(
            F.coalesce(F.col("status"), F.col("o_orderstatus")).alias("status"),
            F.coalesce(F.col("n_orders"), F.lit(0).cast("long")).alias("n_orders"),
        )
    )


_oracle(
    "join_full_outer",
    """
    WITH counts AS (
        SELECT o_orderstatus, COUNT(*) AS n_orders FROM orders GROUP BY o_orderstatus
    ), statuses AS (
        SELECT unnest(['F','O','P','X']) AS status
    )
    SELECT COALESCE(status, o_orderstatus) AS status,
           COALESCE(n_orders, 0) AS n_orders
    FROM statuses FULL OUTER JOIN counts ON status = o_orderstatus
    """,
)


# ---------------------------------------------------------------------------
# E6: semi / anti joins
# ---------------------------------------------------------------------------

def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with at least one open ('O') order — left semi join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return c.join(o, c.c_custkey == o.o_custkey, "left_semi").select(
        "c_custkey", "c_name", "c_mktsegment"
    )


_oracle(
    "join_semi",
    """
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'O'
    )
    """,
)


def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no orders at all — left anti join."""
    c = table(spark, sf_dir, "customer")
    o = table(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_oracle(
    "join_anti",
    """
    SELECT c_custkey, c_name, c_acctbal
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)


# ---------------------------------------------------------------------------
# E7: non-equi (range) join
# ---------------------------------------------------------------------------

def join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lineitems shipped within 60 days of their order date.

    Equi key (orderkey) + range predicate: Catalyst plans the equi part as
    the join key and evaluates the range as a post-join filter, so this stays
    a hash/sort-merge join, not a cartesian product.
    """
    o = table(spark, sf_dir, "orders")
    l = table(spark, sf_dir, "lineitem")
    return (
        l.join(
            o,
            (l.l_orderkey == o.o_orderkey)
            & (l.l_shipdate <= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")),
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_fast_items"),
            dsum("l_quantity", 2).alias("qty"),
        )
    )


_oracle(
    "join_range",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_fast_items,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS qty
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
              AND l_shipdate <= o_orderdate + INTERVAL 60 DAY
    GROUP BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# E8/E9: multi-key aggregates, distinct, count-distinct
# ---------------------------------------------------------------------------

def agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max/sum/avg/stddev per returnflag with deterministic stddev.

    stddev is computed from exact decimal sums (sum x, sum x^2) so the result
    is partitioning-independent — merged-moment implementations are not.
    """
    l = table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sx = F.sum((F.col("l_extendedprice")).cast("decimal(27,4)")).cast("double")
    sx2 = F.sum(
        (F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(38,4)")
    ).cast("double")
    return l.groupBy("l_returnflag").agg(
        F.min("l_extendedprice").alias("min_price"),
        F.max("l_extendedprice").alias("max_price"),
        dsum("l_quantity", 2).alias("sum_qty"),
        (dsum("l_extendedprice", 2) / n).alias("avg_price"),
        F.sqrt((sx2 - sx * sx / n) / (n - F.lit(1))).alias("stddev_price"),
        n.alias("n_rows"),
    )


_oracle(
    "agg_stats",
    """
    SELECT l_returnflag,
           MIN(l_extendedprice) AS min_price,
           MAX(l_extendedprice) AS max_price,
           CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           SQRT((CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
                - CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE)
                  * CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,4))) AS DOUBLE) / COUNT(*))
                / (COUNT(*) - 1)) AS stddev_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)


def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.select("c_mktsegment", "c_nationkey").distinct()


_oracle(
    "distinct_pairs",
    "SELECT DISTINCT c_mktsegment, c_nationkey FROM customer",
)


def count_distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.count(F.lit(1)).alias("n_customers"),
    )


_oracle(
    "count_distinct_agg",
    """
    SELECT c_mktsegment,
           COUNT(DISTINCT c_nationkey) AS n_nations,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)


def approx_count_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL approximate distinct users per event type.

    At 100 TB this replaces exact count-distinct's full shuffle with a
    mergeable fixed-size sketch.  HLL estimates are implementation-specific,
    so the *estimate* has no SQL oracle — instead the bound check happens
    engine-side (|approx - exact| <= 5*rsd*exact) and the oracle verifies
    the exact count plus ``approx_ok = true``.  The exact countDistinct
    exists only for this harness check; a production run drops it.
    """
    e = table(spark, sf_dir, "events")
    rsd = 0.02
    return (
        e.groupBy("event_type")
        .agg(
            F.approx_count_distinct("user_id", rsd=rsd).alias("_approx"),
            F.countDistinct("user_id").alias("exact_users"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select(
            "event_type",
            "n_events",
            "exact_users",
            (
                F.abs(F.col("_approx") - F.col("exact_users"))
                <= F.lit(5 * rsd) * F.col("exact_users")
            ).alias("approx_ok"),
        )
    )


_oracle(
    "approx_count_distinct_users",
    """
    SELECT event_type,
           COUNT(*) AS n_events,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_ok
    FROM events
    GROUP BY event_type
    """,
)


# ---------------------------------------------------------------------------
# E10: grouping sets / rollup / cube
# ---------------------------------------------------------------------------

def rollup_acctbal(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = table(spark, sf_dir, "customer")
    n = table(spark, sf_dir, "nation")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .rollup("n_name", "c_mktsegment")
        .agg(
            dsum("c_acctbal", 2).alias("acctbal_sum"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


_oracle(
    "rollup_acctbal",
    """
    SELECT n_name, c_mktsegment,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE) AS acctbal_sum,
           COUNT(*) AS n_customers
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, c_mktsegment)
    """,
)


def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", 2).alias("revenue"),
    )


_oracle(
    "cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE) AS revenue
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)


def grouping_sets_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL over registered views."""
    table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


_oracle(
    "grouping_sets_agg",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)


# ---------------------------------------------------------------------------
# E13: sort / limit / global top-k
# ---------------------------------------------------------------------------

def global_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by price — Spark plans this as TakeOrderedAndProject
    (per-partition heaps + driver merge), never a full sort at scale.
    Tie-break on orderkey keeps the result deterministic.
    """
    o = table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


_oracle(
    "global_topk",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
)


# ---------------------------------------------------------------------------
# E14: set operations
# ---------------------------------------------------------------------------

def set_operations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT of two customer-key sets, tagged."""
    c = table(spark, sf_dir, "customer")
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    wealthy = c.filter(F.col("c_acctbal") > 5000.0).select("c_custkey")
    return (
        building.union(wealthy).distinct().select(F.lit("union").alias("op"), "c_custkey")
        .unionByName(
            building.intersect(wealthy).select(F.lit("intersect").alias("op"), "c_custkey")
        )
        .unionByName(
            # subtract IS SQL EXCEPT (distinct, set semantics).  The
            # earlier exceptAll().distinct() diverges whenever the left
            # bag holds duplicates that also appear on the right (A=[1,1,2]
            # B=[1]: EXCEPT -> [2], exceptAll+distinct -> [1,2]) — masked
            # here only because c_custkey is unique per customer (r10
            # review); the ALL tier lives in set_operations_all.
            building.subtract(wealthy).select(
                F.lit("except").alias("op"), "c_custkey"
            )
        )
    )


_oracle(
    "set_operations",
    """
    SELECT 'union' AS op, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        UNION
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    )
    UNION ALL
    SELECT 'intersect' AS op, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        INTERSECT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    )
    UNION ALL
    SELECT 'except' AS op, c_custkey FROM (
        SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        EXCEPT
        SELECT c_custkey FROM customer WHERE c_acctbal > 5000.0
    )
    """,
)


def set_operations_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) semantics of the E14 family — INTERSECT ALL /
    EXCEPT ALL over two custkey BAGS with genuine duplicates (a customer
    places many orders), plus the UNION ALL tally.  Result rows carry the
    surviving multiplicity per (op, custkey): intersect_all keeps
    min(count_a, count_b) copies, except_all keeps count_a - count_b
    floored at zero — exactly the edge where distinct-vs-ALL semantics
    diverge between engines, which is why the family needs this second
    driver row (r8 verdict task 6).

    Scale shape: Spark plans intersectAll/exceptAll as one hash
    aggregate per side plus a join on the row value (no sort, no
    cartesian); the final multiplicity count reuses the same key
    partitioning, and everything is map-side-combinable.
    """
    o = table(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select(
        F.col("o_custkey").alias("custkey")
    )
    b = o.filter(F.col("o_orderpriority") == "1-URGENT").select(
        F.col("o_custkey").alias("custkey")
    )
    tagged = (
        a.intersectAll(b).select(F.lit("intersect_all").alias("op"), "custkey")
        .unionByName(
            a.exceptAll(b).select(F.lit("except_all").alias("op"), "custkey")
        )
        .unionByName(
            a.unionAll(b).select(F.lit("union_all").alias("op"), "custkey")
        )
    )
    return tagged.groupBy("op", "custkey").agg(
        F.count(F.lit(1)).alias("multiplicity")
    )


_oracle(
    "set_operations_all",
    """
    WITH a AS (
        SELECT o_custkey AS custkey FROM orders WHERE o_orderstatus = 'O'
    ), b AS (
        SELECT o_custkey AS custkey FROM orders
        WHERE o_orderpriority = '1-URGENT'
    ), tagged AS (
        SELECT 'intersect_all' AS op, custkey FROM (
            SELECT custkey FROM a INTERSECT ALL SELECT custkey FROM b
        )
        UNION ALL
        SELECT 'except_all' AS op, custkey FROM (
            SELECT custkey FROM a EXCEPT ALL SELECT custkey FROM b
        )
        UNION ALL
        SELECT 'union_all' AS op, custkey FROM (
            SELECT custkey FROM a UNION ALL SELECT custkey FROM b
        )
    )
    SELECT op, custkey, COUNT(*) AS multiplicity
    FROM tagged
    GROUP BY op, custkey
    """,
)


# ---------------------------------------------------------------------------
# E10b: pivot (conditional aggregation re-expressed)
# ---------------------------------------------------------------------------

def pivot_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order counts per priority pivoted on status — ``pivot`` with an
    explicit value list (never pivot on unbounded cardinality at scale;
    the explicit list keeps the plan a single pass)."""
    o = table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        # pivot+count yields NULL (not 0) for a (priority, status) combo
        # with no rows, while the oracle's COUNT(CASE...) yields 0 — all
        # 15 combos exist on today's corpora, but a filtered batch would
        # desync the engines (r10 review); fill makes absent = 0 like SQL
        .na.fill(0, ["F", "O", "P"])
    )


_oracle(
    "pivot_status_counts",
    """
    SELECT o_orderpriority,
           COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
           COUNT(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
           COUNT(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# E8c: correlation / covariance via deterministic decimal moment sums
# ---------------------------------------------------------------------------

def corr_covar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + covariance of quantity vs extendedprice per
    returnflag, computed from exact decimal moment sums so the result is
    partitioning-independent (built-in corr/covar merge partial moments in
    nondeterministic order)."""
    l = table(spark, sf_dir, "lineitem")
    n = F.count(F.lit(1))
    sx = F.sum(F.col("l_quantity").cast("decimal(27,2)")).cast("double")
    sy = F.sum(F.col("l_extendedprice").cast("decimal(27,2)")).cast("double")
    sxy = F.sum(
        (F.col("l_quantity") * F.col("l_extendedprice")).cast("decimal(38,4)")
    ).cast("double")
    sx2 = F.sum(
        (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(38,4)")
    ).cast("double")
    sy2 = F.sum(
        (F.col("l_extendedprice") * F.col("l_extendedprice")).cast("decimal(38,4)")
    ).cast("double")
    cov = (sxy - sx * sy / n) / (n - F.lit(1))
    corr = (n * sxy - sx * sy) / (
        F.sqrt(n * sx2 - sx * sx) * F.sqrt(n * sy2 - sy * sy)
    )
    return l.groupBy("l_returnflag").agg(
        cov.alias("covar_qty_price"), corr.alias("corr_qty_price"), n.alias("n_rows")
    )


_oracle(
    "corr_covar",
    """
    SELECT l_returnflag,
           (CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE)
              * CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE) / COUNT(*))
           / (COUNT(*) - 1) AS covar_qty_price,
           (COUNT(*) * CAST(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
            - CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE)
              * CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE))
           / (SQRT(COUNT(*) * CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(38,4))) AS DOUBLE)
                   - CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE)
                     * CAST(SUM(CAST(l_quantity AS DECIMAL(27,2))) AS DOUBLE))
              * SQRT(COUNT(*) * CAST(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(38,4))) AS DOUBLE)
                     - CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE)
                       * CAST(SUM(CAST(l_extendedprice AS DECIMAL(27,2))) AS DOUBLE)))
           AS corr_qty_price,
           COUNT(*) AS n_rows
    FROM lineitem
    GROUP BY l_returnflag
    """,
)


# ---------------------------------------------------------------------------
# E9b: percentiles — approximate sketch (rows-only) next to the exact form
# ---------------------------------------------------------------------------

def approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_percentile (QuantileSummaries sketch) — the 100 TB path:
    mergeable fixed-size state instead of a full sort.

    Sketch values are implementation-specific, so the bound check happens
    engine-side: each approximate quantile must land within 1% relative of
    the exact ``percentile`` — the oracle then checks the order-independent
    columns plus the four booleans.  (The exact percentile exists only for
    this harness check; a production profile drops it.)
    """
    o = table(spark, sf_dir, "orders")
    qs = [0.25, 0.5, 0.75, 0.95]
    agg = o.groupBy("o_orderstatus").agg(
        F.percentile_approx("o_totalprice", qs, 10000).alias("_ap"),
        F.expr(
            "percentile(o_totalprice, array(0.25D, 0.5D, 0.75D, 0.95D))"
        ).alias("_ex"),
        F.count(F.lit(1)).alias("n_orders"),
    )
    bounds = [
        (
            F.abs(F.col("_ap")[i] - F.col("_ex")[i])
            <= F.lit(0.01) * F.abs(F.col("_ex")[i]) + F.lit(1e-6)
        ).alias(f"q{int(q * 100)}_ok")
        for i, q in enumerate(qs)
    ]
    return agg.select("o_orderstatus", "n_orders", *bounds)


_oracle(
    "approx_percentiles",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           TRUE AS q25_ok, TRUE AS q50_ok, TRUE AS q75_ok, TRUE AS q95_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)


# ---------------------------------------------------------------------------
# E7': bucketed range join — the large-large shape
# ---------------------------------------------------------------------------

def range_join_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure-range large-large join via time bucketing: for each purchase
    event, count click events (any user) in the preceding hour.

    ``join_range`` rides an equi key, and small range joins can broadcast
    one side with a residual filter — but a pure range predicate between
    two LARGE tables has no equi key and no broadcastable side.  The scale
    shape is binning: both sides map to 1-hour buckets (each purchase
    probes its own and the previous bucket via a row-local ``sequence`` +
    ``explode``), the join becomes an equi-join on the bucket id, and the
    exact range predicate filters residually.  The shuffle is keyed on time
    buckets, so work distributes with data volume — no O(n^2) pair loop,
    no broadcast of a fact-sized side.  Per-pair cost is bounded by bucket
    width ~ range width.
    """
    e = table(spark, sf_dir, "events")
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("ts").alias("c_ts"),
        (F.unix_timestamp("ts") / 3600).cast("long").alias("bucket"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("ts").alias("p_ts")
    )
    p_hi = (F.unix_timestamp("p_ts") / 3600).cast("long")
    p_lo = ((F.unix_timestamp("p_ts") - 3600) / 3600).cast("long")
    probes = p.select(
        "purchase_id", "p_ts", F.explode(F.sequence(p_lo, p_hi)).alias("bucket")
    )
    return (
        probes.join(clicks, "bucket")
        .filter(
            (F.col("c_ts") >= F.col("p_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("c_ts") < F.col("p_ts"))
        )
        .groupBy("purchase_id")
        .agg(F.count(F.lit(1)).alias("n_prior_clicks"))
    )


_oracle(
    "range_join_bucketed",
    """
    SELECT p.event_id AS purchase_id, COUNT(*) AS n_prior_clicks
    FROM events p JOIN events c
      ON p.event_type = 'purchase' AND c.event_type = 'click'
     AND c.ts >= p.ts - INTERVAL 1 HOUR AND c.ts < p.ts
    GROUP BY p.event_id
    """,
)


# ---------------------------------------------------------------------------
# E4 variant: null-safe equality join (<=>)
# ---------------------------------------------------------------------------

def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (``<=>`` / IS NOT DISTINCT FROM): customers
    keyed by ``nullif(c_mktsegment, 'BUILDING')`` (so BUILDING rows carry
    a NULL key) joined to the distinct key dim — a plain equality join
    silently DROPS every NULL-keyed row; ``eqNullSafe`` matches them to
    the dim's NULL row.  The NULL-vs-dropped distinction is the classic
    silent-data-loss bug in dimension joins.

    Scale note: EqualNullSafe is still a hash-join-able key (Catalyst
    rewrites it to a coalesce-keyed equality), so the plan stays a
    broadcast/sort-merge hash join — no nested loop (pinned by the plan
    lint, which this entry is NOT exempted from).
    """
    c = table(spark, sf_dir, "customer").select(
        F.expr("nullif(c_mktsegment, 'BUILDING')").alias("seg_key"),
        "c_acctbal",
    )
    dim = (
        c.select("seg_key")
        .distinct()
        .select(
            "seg_key",
            F.coalesce(F.col("seg_key"), F.lit("(none)")).alias("seg_label"),
        )
    )
    return (
        c.join(F.broadcast(dim), c["seg_key"].eqNullSafe(dim["seg_key"]))
        .groupBy("seg_label")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(F.col("c_acctbal").cast("decimal(27,2)"))
            .cast("double")
            .alias("total_acctbal"),
        )
    )


_oracle(
    "join_null_safe",
    """
    WITH c AS (
        SELECT nullif(c_mktsegment, 'BUILDING') AS seg_key, c_acctbal
        FROM customer
    ), dim AS (
        SELECT seg_key, COALESCE(seg_key, '(none)') AS seg_label
        FROM (SELECT DISTINCT seg_key FROM c)
    )
    SELECT seg_label,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(27,2))) AS DOUBLE)
               AS total_acctbal
    FROM c JOIN dim ON c.seg_key IS NOT DISTINCT FROM dim.seg_key
    GROUP BY seg_label
    """,
)
