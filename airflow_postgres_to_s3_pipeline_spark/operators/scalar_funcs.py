"""Scalar function layer (SURVEY.md §2B E15-E20).

All expressions are built-in ``pyspark.sql.functions`` — JVM-side, inside
whole-stage codegen; no Python crosses the row path.  Oracle SQL mirrors
each expression with explicit casts wherever DuckDB's return type differs
from Spark's (length/floor -> BIGINT in DuckDB vs INT/LONG in Spark, etc.).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table

ORACLES: dict[str, str] = {}


def _oracle(name: str, sql: str):
    ORACLES[name] = sql


# ---------------------------------------------------------------------------
# E15: string functions
# ---------------------------------------------------------------------------

def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = table(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.trim(F.col("p_name")).alias("name_trim"),
        F.regexp_extract("p_name", r"^(\w+)", 1).alias("first_word"),
        F.regexp_replace("p_name", r" ", "_").alias("name_snake"),
        F.concat_ws("-", "p_brand", "p_type").alias("brand_type"),
        F.size(F.split("p_name", " ")).alias("n_words"),
        F.lpad("p_brand", 12, "*").alias("brand_padded"),
        F.col("p_name").contains("green").alias("has_green"),
    )


_oracle(
    "string_functions",
    r"""
    SELECT p_partkey,
           UPPER(p_name) AS name_upper,
           LOWER(p_brand) AS brand_lower,
           SUBSTRING(p_name, 1, 8) AS name_prefix,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           TRIM(p_name) AS name_trim,
           regexp_extract(p_name, '^(\w+)', 1) AS first_word,
           regexp_replace(p_name, ' ', '_', 'g') AS name_snake,
           concat_ws('-', p_brand, p_type) AS brand_type,
           CAST(LEN(string_split(p_name, ' ')) AS INTEGER) AS n_words,
           LPAD(p_brand, 12, '*') AS brand_padded,
           contains(p_name, 'green') AS has_green
    FROM part
    """,
)


# ---------------------------------------------------------------------------
# E16: date/time functions
# ---------------------------------------------------------------------------

def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.dayofmonth("o_orderdate").alias("dom"),
        F.quarter("o_orderdate").alias("qtr"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.lit("2000-01-01").cast("date"), d).alias("days_to_y2k"),
        F.date_add(d, 30).alias("ship_by"),
        F.last_day(d).alias("month_end"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


_oracle(
    "date_functions",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER) AS yr,
           CAST(month(o_orderdate) AS INTEGER) AS mo,
           CAST(day(o_orderdate) AS INTEGER) AS dom,
           CAST(quarter(o_orderdate) AS INTEGER) AS qtr,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2000-01-01') AS INTEGER) AS days_to_y2k,
           CAST(o_orderdate AS DATE) + 30 AS ship_by,
           last_day(CAST(o_orderdate AS DATE)) AS month_end,
           CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
    FROM orders
    """,
)


# ---------------------------------------------------------------------------
# E17: math functions
# ---------------------------------------------------------------------------

def math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        (F.col("l_extendedprice") / 1000.0).alias("price_k"),
        F.floor("l_extendedprice").alias("price_floor"),
        F.ceil("l_extendedprice").alias("price_ceil"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.sqrt("l_extendedprice").alias("price_sqrt"),
        F.round(F.pow("l_quantity", 2), 4).alias("qty_sq"),
        F.round(F.log("l_extendedprice"), 6).alias("price_ln"),
        F.round(F.log10("l_extendedprice"), 6).alias("price_log10"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
        F.greatest("l_discount", "l_tax").alias("max_rate"),
        F.least("l_discount", "l_tax").alias("min_rate"),
    )


_oracle(
    "math_functions",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / 1000.0 AS price_k,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           ABS(l_discount - 0.05) AS disc_dev,
           SQRT(l_extendedprice) AS price_sqrt,
           ROUND(POW(l_quantity, 2), 4) AS qty_sq,
           ROUND(LN(l_extendedprice), 6) AS price_ln,
           ROUND(LOG10(l_extendedprice), 6) AS price_log10,
           l_orderkey % 7 AS key_mod7,
           GREATEST(l_discount, l_tax) AS max_rate,
           LEAST(l_discount, l_tax) AS min_rate
    FROM lineitem
    """,
)


# ---------------------------------------------------------------------------
# E18: conditional / null-handling functions
# ---------------------------------------------------------------------------

def conditional_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.when(F.col("o_totalprice") < 50000.0, "low")
        .when(F.col("o_totalprice") < 150000.0, "mid")
        .otherwise("high")
        .alias("price_bucket"),
        F.coalesce(F.nullif("o_orderstatus", F.lit("O")), F.lit("open")).alias(
            "status_or_open"
        ),
        (F.col("o_orderpriority") == "1-URGENT").alias("is_urgent"),
        F.when(F.col("o_orderstatus") == "F", 1).otherwise(0).alias("finished_flag"),
        F.greatest(F.col("o_totalprice"), F.lit(100000.0)).alias("price_floor_100k"),
    )


_oracle(
    "conditional_functions",
    """
    SELECT o_orderkey,
           CASE WHEN o_totalprice < 50000.0 THEN 'low'
                WHEN o_totalprice < 150000.0 THEN 'mid'
                ELSE 'high' END AS price_bucket,
           COALESCE(NULLIF(o_orderstatus, 'O'), 'open') AS status_or_open,
           o_orderpriority = '1-URGENT' AS is_urgent,
           CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS finished_flag,
           GREATEST(o_totalprice, 100000.0) AS price_floor_100k
    FROM orders
    """,
)


# ---------------------------------------------------------------------------
# E19: array functions + higher-order functions
# ---------------------------------------------------------------------------

def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    words = F.split("text", " ")
    return d.select(
        "doc_id",
        F.size(words).alias("n_words"),
        F.size(F.array_distinct(words)).alias("n_distinct_words"),
        F.element_at(words, 1).alias("first_word"),
        F.array_max(F.transform(words, lambda w: F.length(w))).alias("longest_word_len"),
        F.aggregate(
            F.transform(words, lambda w: F.length(w)),
            F.lit(0),
            lambda acc, x: acc + x,
        ).alias("total_word_chars"),
        F.array_contains(words, "spark").alias("mentions_spark"),
        F.size(F.filter(words, lambda w: F.length(w) > 5)).alias("n_long_words"),
    )


_oracle(
    "array_functions",
    """
    SELECT doc_id,
           CAST(LEN(string_split(text, ' ')) AS INTEGER) AS n_words,
           CAST(LEN(list_distinct(string_split(text, ' '))) AS INTEGER) AS n_distinct_words,
           string_split(text, ' ')[1] AS first_word,
           CAST(list_max(list_transform(string_split(text, ' '), w -> LENGTH(w))) AS INTEGER) AS longest_word_len,
           CAST(list_sum(list_transform(string_split(text, ' '), w -> LENGTH(w))) AS INTEGER) AS total_word_chars,
           list_contains(string_split(text, ' '), 'spark') AS mentions_spark,
           CAST(LEN(list_filter(string_split(text, ' '), w -> LENGTH(w) > 5)) AS INTEGER) AS n_long_words
    FROM documents
    """,
)


def explode_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UDTF-style lateral explode: corpus word frequency (E19/E21 surface).

    explode -> groupBy is the scalable word-count shape: tokens shuffle once
    on the word key with map-side partial counts.
    """
    d = table(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") > 0)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") >= 10)
    )


_oracle(
    "explode_word_freq",
    """
    SELECT word, COUNT(*) AS freq
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE LENGTH(word) > 0
    GROUP BY word
    HAVING COUNT(*) >= 10
    """,
)


# ---------------------------------------------------------------------------
# E20: map & JSON functions (events.props is a JSON string)
# ---------------------------------------------------------------------------

def json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parse events.props JSON two ways (path extraction + typed from_json)
    and aggregate the extracted value per event type."""
    e = table(spark, sf_dir, "events")
    k_path = F.get_json_object("props", "$.k").cast("long")
    parsed = F.from_json("props", "struct<k:bigint>")
    return (
        e.select(
            "event_id",
            "event_type",
            k_path.alias("k_value"),
            parsed.getField("k").alias("k_typed"),
        )
        .groupBy("event_type")
        .agg(
            F.sum("k_value").alias("sum_k"),
            (F.sum("k_typed").cast("double") / F.count("k_typed")).alias("avg_k"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_oracle(
    "json_functions",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS DOUBLE)
               / COUNT(json_extract_string(props, '$.k')) AS avg_k,
           COUNT(*) AS n_events
    FROM events
    GROUP BY event_type
    """,
)


def map_hof_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order map functions: transform_values / map_filter /
    map_zip_with over a per-row metrics map, with scalar outputs so the
    result stays hash-comparable."""
    o = table(spark, sf_dir, "orders")
    m = F.create_map(
        F.lit("price"), F.col("o_totalprice"),
        F.lit("half"), F.col("o_totalprice") / 2.0,
    )
    doubled = F.transform_values(m, lambda k, v: v * 2.0)
    only_big = F.map_filter(m, lambda k, v: v > 100000.0)
    summed = F.map_zip_with(m, doubled, lambda k, a, b: a + b)
    return o.select(
        "o_orderkey",
        doubled.getItem("price").alias("price_x2"),
        F.size(only_big).alias("n_big_entries"),
        summed.getItem("half").alias("half_x3"),
    )


_oracle(
    "map_hof_functions",
    """
    SELECT o_orderkey,
           o_totalprice * 2.0 AS price_x2,
           CAST(CASE WHEN o_totalprice > 100000.0 THEN 1 ELSE 0 END
                + CASE WHEN o_totalprice / 2.0 > 100000.0 THEN 1 ELSE 0 END
                AS INTEGER) AS n_big_entries,
           o_totalprice / 2.0 + (o_totalprice / 2.0) * 2.0 AS half_x3
    FROM orders
    """,
)


def try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANSI-safe ``try_*`` arithmetic: errors become NULL instead of failing
    the job — division by zero, overflow-safe add, invalid casts.  The
    error-tolerance surface a dirty 100 TB corpus needs (one bad row must
    not kill a 6-hour job)."""
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.try_divide(
            F.col("l_extendedprice"), F.col("l_quantity") - 25.0
        ).alias("per_unit_above_25"),
        F.try_add(F.col("l_orderkey"), F.lit(1)).alias("next_key"),
        F.try_to_number(F.lit("not-a-number"), F.lit("999")).alias("bad_parse"),
    )


_oracle(
    "try_arithmetic",
    """
    SELECT l_orderkey, l_linenumber,
           CASE WHEN l_quantity - 25.0 = 0 THEN NULL
                ELSE l_extendedprice / (l_quantity - 25.0) END
               AS per_unit_above_25,
           l_orderkey + 1 AS next_key,
           CAST(NULL AS DECIMAL(3,0)) AS bad_parse
    FROM lineitem
    """,
)


def variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access via Spark 4 VARIANT: parse_json once, then
    typed path extraction — the engine's schema-on-read path for nested
    data whose shape varies per row (binary-encoded, predicate-pushable,
    cheaper than repeated string json parsing at 100 TB)."""
    e = table(spark, sf_dir, "events")
    v = F.parse_json("props")
    return e.select(
        "event_id",
        "event_type",
        F.try_variant_get(v, "$.k", "bigint").alias("k_variant"),
        F.is_variant_null(F.try_variant_get(v, "$.missing", "variant")).alias(
            "missing_is_null"
        ),
        F.schema_of_variant(v).alias("v_schema"),
    )


_oracle(
    "variant_json",
    """
    SELECT event_id, event_type,
           CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_variant,
           FALSE AS missing_is_null,
           'OBJECT<k: BIGINT>' AS v_schema
    FROM events
    """,
)


# ---------------------------------------------------------------------------
# E20b: map functions
# ---------------------------------------------------------------------------

def map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a map column from scalars, extract/inspect it — map plumbing
    stays JVM-side; outputs are scalars so the result is hash-comparable."""
    e = table(spark, sf_dir, "events")
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("uid"), F.col("user_id").cast("string"),
    )
    return e.select(
        "event_id",
        m.getItem("type").alias("m_type"),
        m.getItem("uid").alias("m_uid"),
        F.size(m).alias("m_size"),
        F.concat_ws(",", F.array_sort(F.map_keys(m))).alias("m_keys_csv"),
        F.map_contains_key(m, "uid").alias("has_uid"),
    )


_oracle(
    "map_functions",
    """
    SELECT event_id,
           event_type AS m_type,
           CAST(user_id AS VARCHAR) AS m_uid,
           2 AS m_size,
           'type,uid' AS m_keys_csv,
           TRUE AS has_uid
    FROM events
    """,
)


# ---------------------------------------------------------------------------
# E16 second tier: interval arithmetic + ISO-calendar fields
# ---------------------------------------------------------------------------

def date_interval_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second E16 tier: the calendar edges the first tier doesn't touch —
    ISO week truncation/numbering (Monday-start on both engines),
    day-of-week origin reconciliation (Spark Sunday=1 vs DuckDB
    Sunday=0), month-clamped interval addition (Jan 31 + 3 months lands
    on Apr 30 on both engines), strict-after next-weekday arithmetic
    (``next_day`` mirrored as ``date + (8 - isodow)``), and
    ``make_date`` reconstruction.  All expressions are codegen'd
    column arithmetic on the scan — no shuffle, no Python."""
    o = table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return o.select(
        "o_orderkey",
        F.date_trunc("week", "o_orderdate").cast("date").alias("week_start"),
        F.trunc(d, "quarter").alias("quarter_start"),
        F.weekofyear(d).alias("iso_week"),
        F.dayofyear(d).alias("doy"),
        F.dayofweek(d).alias("dow_sun1"),
        F.add_months(d, 3).alias("plus_3mo"),
        F.date_add(d, 90).alias("plus_90d"),
        F.next_day(d, "Mon").alias("next_monday"),
        F.make_date(F.year(d), F.month(d), F.lit(1)).alias("month_floor"),
    )


_oracle(
    "date_interval_functions",
    """
    SELECT o_orderkey,
           CAST(date_trunc('week', o_orderdate) AS DATE) AS week_start,
           CAST(date_trunc('quarter', o_orderdate) AS DATE) AS quarter_start,
           CAST(weekofyear(o_orderdate) AS INTEGER) AS iso_week,
           CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
           CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE) AS plus_3mo,
           CAST(o_orderdate AS DATE) + 90 AS plus_90d,
           CAST(o_orderdate AS DATE) + CAST(8 - isodow(o_orderdate) AS INTEGER) AS next_monday,
           make_date(CAST(year(o_orderdate) AS INTEGER),
                     CAST(month(o_orderdate) AS INTEGER), 1) AS month_floor
    FROM orders
    """,
)


# ---------------------------------------------------------------------------
# E17 second tier: transcendental + bitwise functions
# ---------------------------------------------------------------------------

def math_trig_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Second E17 tier: the function groups the first tier doesn't cover —
    trigonometry (sin/cos/atan2), angle conversion, exp/cbrt, signum,
    and the bitwise trio (shift-left / AND-mask / XOR) that backs hash
    partitioners and bitmap tricks.  Transcendentals are rounded to 6
    decimals (same rule as tier 1's ln/log10) because JVM StrictMath
    and DuckDB libm agree only to ~1 ULP, not bit-exactly; integer bit
    ops are exact on both engines."""
    l = table(spark, sf_dir, "lineitem")
    return l.select(
        "l_orderkey",
        "l_linenumber",
        F.round(F.sin("l_discount"), 6).alias("disc_sin"),
        F.round(F.cos("l_tax"), 6).alias("tax_cos"),
        F.round(F.atan2("l_discount", "l_tax"), 6).alias("rate_atan2"),
        F.round(F.degrees("l_discount"), 6).alias("disc_deg"),
        F.round(F.radians("l_quantity"), 6).alias("qty_rad"),
        F.round(F.exp("l_discount"), 6).alias("disc_exp"),
        F.round(F.cbrt("l_quantity"), 6).alias("qty_cbrt"),
        F.signum(F.col("l_discount") - 0.05).cast("int").alias("disc_sign"),
        # sqrt(x*x + y*y) rather than F.hypot: Math.hypot's ~1-ulp algorithm
        # differs from DuckDB's SQRT(x*x+y*y), so the raw doubles could
        # disagree at a 6-decimal rounding boundary on a future corpus;
        # spelling the identical IEEE expression on both sides makes the
        # pairing exact by construction (ADVICE r9).
        F.round(
            F.sqrt(
                F.col("l_discount") * F.col("l_discount")
                + F.col("l_tax") * F.col("l_tax")
            ),
            6,
        ).alias("rate_hypot"),
        F.shiftleft("l_orderkey", 2).alias("key_shl2"),
        F.col("l_orderkey").bitwiseAND(F.lit(255)).alias("key_lo8"),
        F.col("l_orderkey").bitwiseXOR(F.col("l_suppkey")).alias("key_xor_supp"),
    )


_oracle(
    "math_trig_bits",
    """
    SELECT l_orderkey, l_linenumber,
           ROUND(SIN(l_discount), 6) AS disc_sin,
           ROUND(COS(l_tax), 6) AS tax_cos,
           ROUND(ATAN2(l_discount, l_tax), 6) AS rate_atan2,
           ROUND(DEGREES(l_discount), 6) AS disc_deg,
           ROUND(RADIANS(l_quantity), 6) AS qty_rad,
           ROUND(EXP(l_discount), 6) AS disc_exp,
           ROUND(CBRT(l_quantity), 6) AS qty_cbrt,
           CAST(SIGN(l_discount - 0.05) AS INTEGER) AS disc_sign,
           ROUND(SQRT(l_discount * l_discount + l_tax * l_tax), 6) AS rate_hypot,
           l_orderkey << 2 AS key_shl2,
           l_orderkey & 255 AS key_lo8,
           xor(l_orderkey, l_suppkey) AS key_xor_supp
    FROM lineitem
    """,
)
