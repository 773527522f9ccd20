"""Spark 4 SQL-surface operators: correlated LATERAL joins, SQL-defined
functions (``CREATE FUNCTION``), collation-aware grouping, and XML
functions (SURVEY.md §2B E4/E15/E20/E21 surface extensions).

The reference's PostgresToS3Operator forwards arbitrary SQL to Postgres
(plugins/custom_operator/postgres_to_s3_operator.py:21,42); these entries
cover the modern-SQL constructs a Postgres user would expect to keep when
switching engines: LATERAL derived tables (Postgres has had them since
9.3), SQL-body functions (CREATE FUNCTION ... LANGUAGE SQL), collations,
and XML serialization — each expressed through Spark's native support so
Catalyst plans (and decorrelates) them rather than a UDF black box.

Scale notes: the LATERAL top-k decorrelates into a ranking window over a
single shuffle of the fact side (no per-row subquery execution — verify
with .explain: a Window + filter, not a nested loop); SQL UDFs inline
into the plan at analysis time, so they whole-stage-codegen exactly like
the hand-written expression; collation comparisons stay JVM-side; XML
round-trips run per-row with no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from airflow_postgres_to_s3_pipeline_spark.catalog import register_views

ORACLES: dict[str, str] = {}


def _oracle(name: str, sql: str):
    ORACLES[name] = sql


# ---------------------------------------------------------------------------
# Correlated LATERAL derived table (top-2 orders per BUILDING customer).
# ---------------------------------------------------------------------------

def lateral_topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI LATERAL correlated derived table: each customer's two most
    expensive orders.  Catalyst decorrelates the LIMIT-inside-LATERAL into
    a ranking window over one shuffle of ``orders`` — the 100 TB-safe plan
    (a naive engine would re-run the subquery once per customer row).
    Tie-break on o_orderkey keeps the emitted pair deterministic.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
        FROM customer c, LATERAL (
            SELECT o_orderkey, o_totalprice
            FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey
            LIMIT 2
        ) l
        WHERE c.c_mktsegment = 'BUILDING'
        """
    )


_oracle(
    "lateral_topk_orders",
    """
    SELECT c.c_custkey, l.o_orderkey, l.o_totalprice
    FROM customer c, LATERAL (
        SELECT o_orderkey, o_totalprice
        FROM orders
        WHERE o_custkey = c.c_custkey
        ORDER BY o_totalprice DESC, o_orderkey
        LIMIT 2
    ) l
    WHERE c.c_mktsegment = 'BUILDING'
    """,
)


# ---------------------------------------------------------------------------
# SQL-defined functions: scalar + table-valued (Spark 4 CREATE FUNCTION).
# ---------------------------------------------------------------------------

def sql_udf_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-body UDFs (Spark 4): a scalar ``price_band``, a scalar
    ``urgency_rank``, and a table-valued ``big_orders(threshold)`` used in
    FROM position.  All three inline at analysis time, so the optimized
    plan is identical to hand-written expressions — pushdown, codegen, and
    partial aggregation all survive (UNlike an opaque Python UDF).

    The oracle inlines the same bodies: DuckDB macros would work too, but
    inlining IS the semantics being asserted.
    """
    register_views(spark, sf_dir)
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION price_band(p DOUBLE)
        RETURNS STRING
        RETURN CASE WHEN p < 100000 THEN 'low'
                    WHEN p < 250000 THEN 'mid'
                    ELSE 'high' END
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION urgency_rank(pri STRING)
        RETURNS INT
        RETURN CAST(substring(pri, 1, 1) AS INT)
        """
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION big_orders(threshold DOUBLE)
        RETURNS TABLE(o_orderkey BIGINT, o_totalprice DOUBLE,
                      o_orderpriority STRING)
        RETURN SELECT o_orderkey, o_totalprice, o_orderpriority
               FROM orders WHERE o_totalprice >= threshold
        """
    )
    return spark.sql(
        """
        SELECT price_band(o_totalprice) AS band,
               urgency_rank(o_orderpriority) AS urgency,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                   AS total_price
        FROM big_orders(50000.0)
        GROUP BY band, urgency
        """
    )


_oracle(
    "sql_udf_functions",
    """
    SELECT CASE WHEN o_totalprice < 100000 THEN 'low'
                WHEN o_totalprice < 250000 THEN 'mid'
                ELSE 'high' END AS band,
           CAST(substring(o_orderpriority, 1, 1) AS INT) AS urgency,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_totalprice >= 50000.0
    GROUP BY band, urgency
    """,
)


# ---------------------------------------------------------------------------
# Collation-aware grouping (Spark 4 UTF8_LCASE).
# ---------------------------------------------------------------------------

def collation_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive grouping via a real collation (UTF8_LCASE), not a
    lower() rewrite: the CASE deterministically mixes the case of p_type,
    then grouping and the equality filter both run under the collation.
    The emitted group key is ``lower(min(t))`` so output stays
    deterministic (which case-variant "wins" a collated MIN is not).

    Oracle maps the collation to lower()-grouping — equivalent on this
    ASCII data; the entry asserts Spark's collated GROUP BY/filter land in
    the same equivalence classes.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH src AS (
            SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                        ELSE lower(p_type) END AS t,
                   p_retailprice
            FROM part
        )
        SELECT lower(min(t)) AS type_lc,
               COUNT(*) AS n_parts,
               CAST(SUM(CAST(p_retailprice AS DECIMAL(27,2))) AS DOUBLE)
                   AS total_price
        FROM src
        WHERE NOT (t COLLATE UTF8_LCASE = 'STANDARD')
        GROUP BY t COLLATE UTF8_LCASE
        """
    )


_oracle(
    "collation_group",
    """
    WITH src AS (
        SELECT CASE WHEN p_partkey % 2 = 0 THEN upper(p_type)
                    ELSE lower(p_type) END AS t,
               p_retailprice
        FROM part
    )
    SELECT lower(min(t)) AS type_lc,
           COUNT(*) AS n_parts,
           CAST(SUM(CAST(p_retailprice AS DECIMAL(27,2))) AS DOUBLE)
               AS total_price
    FROM src
    WHERE lower(t) <> 'standard'
    GROUP BY lower(t)
    """,
)


# ---------------------------------------------------------------------------
# XML functions: to_xml / from_xml round-trip + XPath extraction (E20).
# ---------------------------------------------------------------------------

def xml_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """XML surface: serialize each order to XML (``to_xml``), parse it
    back (``from_xml``) and re-extract the fields, plus an XPath aggregate
    over a constructed fragment.  Row-local, no shuffle; the oracle
    reconstructs Spark's exact serialization (ROW tag, 4-space indent)
    with string concatenation and emits the round-tripped values from the
    base columns.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        WITH ser AS (
            SELECT o_orderkey, o_orderstatus, o_orderpriority,
                   to_xml(named_struct(
                       'k', o_orderkey,
                       's', o_orderstatus,
                       'p', o_orderpriority)) AS xml_doc
            FROM orders
        ), rt AS (
            SELECT o_orderkey, xml_doc,
                   from_xml(xml_doc, 'k BIGINT, s STRING, p STRING') AS parsed
            FROM ser
        )
        SELECT o_orderkey,
               xml_doc,
               parsed.s AS rt_status,
               parsed.p AS rt_priority,
               xpath_long(concat('<r><a>', CAST(o_orderkey AS STRING),
                                 '</a><a>', CAST(o_orderkey + 1 AS STRING),
                                 '</a></r>'),
                          'sum(r/a)') AS xp_sum
        FROM rt
        """
    )


_oracle(
    "xml_functions",
    """
    SELECT o_orderkey,
           '<ROW>' || chr(10) ||
           '    <k>' || CAST(o_orderkey AS VARCHAR) || '</k>' || chr(10) ||
           '    <s>' || o_orderstatus || '</s>' || chr(10) ||
           '    <p>' || o_orderpriority || '</p>' || chr(10) ||
           '</ROW>' AS xml_doc,
           o_orderstatus AS rt_status,
           o_orderpriority AS rt_priority,
           o_orderkey * 2 + 1 AS xp_sum
    FROM orders
    """,
)


# ---------------------------------------------------------------------------
# SQL scripting (Spark 4 BEGIN/DECLARE/WHILE) — procedural control flow
# ---------------------------------------------------------------------------

def sql_scripting_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL scripting (Spark 4): a BEGIN...END block DECLAREs a threshold
    variable and doubles it in a WHILE loop until fewer than 25% of orders
    exceed it, then aggregates above the converged threshold — the
    procedural search-then-query pattern a Postgres user writes in
    PL/pgSQL (the reference delegates arbitrary SQL to Postgres, where
    DO-blocks are routine).

    Each loop iteration is a full Catalyst-planned COUNT (pushdown and
    partial aggregation apply per probe — this is driver-side control
    flow over distributed queries, not a driver-side data loop).  The
    loop is deterministic (fraction-of-total stop, price cap ~500k means
    it converges in <=4 doublings at any SF); the oracle unrolls it as a
    threshold ladder + correlated counts and picks the same stop.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        BEGIN
          DECLARE thr DOUBLE DEFAULT 50000.0;
          WHILE (SELECT COUNT(*) FROM orders WHERE o_totalprice > thr)
                >= 0.25 * (SELECT COUNT(*) FROM orders) DO
            SET thr = thr * 2;
          END WHILE;
          SELECT o_orderpriority, COUNT(*) AS n_orders, thr AS threshold
          FROM orders WHERE o_totalprice > thr GROUP BY o_orderpriority;
        END
        """
    )


_oracle(
    "sql_scripting_threshold",
    """
    WITH steps AS (
        SELECT 50000.0 * power(2, g) AS thr FROM generate_series(0, 30) t(g)
    ), counts AS (
        SELECT s.thr,
               (SELECT COUNT(*) FROM orders WHERE o_totalprice > s.thr) AS c
        FROM steps s
    ), chosen AS (
        SELECT MIN(thr) AS thr FROM counts
        WHERE c < 0.25 * (SELECT COUNT(*) FROM orders)
    )
    SELECT o_orderpriority, COUNT(*) AS n_orders, chosen.thr AS threshold
    FROM orders, chosen
    WHERE o_totalprice > chosen.thr
    GROUP BY o_orderpriority, chosen.thr
    """,
)


# ---------------------------------------------------------------------------
# SQL pipe syntax (Spark 4 |> operator chains)
# ---------------------------------------------------------------------------

def sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL pipe syntax (Spark 4): the ``FROM t |> WHERE |> AGGREGATE``
    operator-chain form of a classic filter->aggregate — the same
    Catalyst plan as the nested-SELECT form (pushdown, partial
    aggregation all identical; pipes are pure syntax), which is exactly
    what the standard-SQL oracle asserts.
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        FROM orders
        |> WHERE o_totalprice > 100000
        |> AGGREGATE COUNT(*) AS n_orders,
                     CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2)))
                          AS DOUBLE) AS total_price
           GROUP BY o_orderpriority
        """
    )


_oracle(
    "sql_pipe_syntax",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
               AS total_price
    FROM orders
    WHERE o_totalprice > 100000
    GROUP BY o_orderpriority
    """,
)


# ---------------------------------------------------------------------------
# Parameterized SQL (named parameter markers)
# ---------------------------------------------------------------------------

def parameterized_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Named-parameter SQL (``:name`` markers bound via
    ``spark.sql(query, args=...)``): parameters bind as typed literals at
    analysis time — they constant-fold and push down like any literal,
    and the query text stays injection-safe (the reference's
    PostgresToS3Operator interpolates raw strings into SQL; this is the
    engine-native alternative).
    """
    register_views(spark, sf_dir)
    return spark.sql(
        """
        SELECT c.c_mktsegment,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
                   AS total_price
        FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        WHERE o.o_totalprice > :min_price AND c.c_mktsegment <> :excluded
        GROUP BY c.c_mktsegment
        """,
        args={"min_price": 150000.0, "excluded": "MACHINERY"},
    )


_oracle(
    "parameterized_query",
    """
    SELECT c.c_mktsegment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o.o_totalprice AS DECIMAL(27,2))) AS DOUBLE)
               AS total_price
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE o.o_totalprice > 150000.0 AND c.c_mktsegment <> 'MACHINERY'
    GROUP BY c.c_mktsegment
    """,
)


_CHAIN_SQL = """
    WITH RECURSIVE seq AS (
        SELECT o_custkey, o_orderkey, o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY o_custkey
                                  ORDER BY o_orderdate, o_orderkey) AS pos
        FROM orders
    ),
    chain(o_custkey, pos, cum_spend) AS (
        SELECT o_custkey, pos, o_totalprice FROM seq WHERE pos = 1
        UNION ALL
        SELECT s.o_custkey, s.pos, c.cum_spend + s.o_totalprice
        FROM chain c JOIN seq s
          ON s.o_custkey = c.o_custkey AND s.pos = c.pos + 1
    )
    SELECT o_custkey AS custkey,
           MAX(pos) AS chain_len,
           MAX_BY(cum_spend, pos) AS total_spend
    FROM chain GROUP BY o_custkey
"""


def recursive_cte_order_chains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 RECURSIVE CTE (WITH RECURSIVE ... UNION ALL): walk each
    customer's order chain in date order, accumulating spend step by step.

    Complements advanced.recursive_order_chain (intra-order linenumber
    walk, natural key, depth ~7): here the successor relation is DERIVED
    (a ranking window builds (custkey, pos) edges), depth is data-driven
    (~25 orders for the busiest customer — a quarter of the default
    cteRecursionLevelLimit), and the docstring below records the
    UNION-recursion limitation that keeps cyclic closures out of SQL.

    The construct a Postgres user reaching for ``WITH RECURSIVE`` expects
    to keep — demonstrated on an ACYCLIC recursion (chains, strictly
    increasing rank), because Spark 4.1 supports UNION ALL recursion only:
    cycle-safe UNION closure is rejected at analysis time
    ([UNION_NOT_SUPPORTED_IN_RECURSIVE_CTE]), which is exactly why the
    engine's connected-components tier is the iterative DataFrame loop
    (dedup.connected_components), not a recursive CTE.

    Determinism: cum_spend is a SEQUENTIAL float accumulation, but the
    recursion defines the addition order (chain position), so both engines
    compute the identical ((p1+p2)+p3)... fold — bit-exact without any
    rounding.

    Scale shape: each recursion level joins the (one-thin-row-per-
    customer) frontier against the ranked orders on (custkey, pos) — depth
    = max orders per customer, total work linear in orders.  That
    per-level shuffle is the honest cost of linked-list traversal in SQL;
    when the aggregate is windowable (as this demo's is), the single
    window shuffle wins — the recursion tier exists for the traversals
    that are NOT windowable (variable-step state machines, graph walks).
    Guardrails at larger inputs: cteRecursionRowLimit is raised to
    session.CTE_ROW_LIMIT by the session factory (get_spark +
    tune_runtime — centralized there so no operator mutates shared
    config; r12 ADVICE) because total emitted rows for this walk equal
    |orders| — the 1e6 default aborts at probe scale (r12 sf1 finding on
    the sibling entry) — while spark.sql.cteRecursionLevelLimit keeps
    its default 100 as the runaway-depth guard.  Past ~sf150 the scale
    tier is the iterative frontier walk (advanced.frontier_order_chain
    demonstrates the shape); see docs/SCALE.md "Recursive-walk cutover".
    """
    register_views(spark, sf_dir)
    return spark.sql(_CHAIN_SQL)


_oracle("recursive_cte_order_chains", _CHAIN_SQL)
