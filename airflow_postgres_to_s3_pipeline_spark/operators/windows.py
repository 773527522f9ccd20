"""Window functions and time-window aggregation (SURVEY.md §2B E11-E12, E22).

Ranking/analytic windows partition by a key and sort within the partition —
one shuffle on the partition key, then a per-partition sort; at 100 TB the
partition key (custkey/user_id) must be high-cardinality, which these are.
Every ORDER BY carries a unique tie-break column so results are
deterministic and hash-comparable.

Time windows (tumbling/sliding/session) are expressed with the same
``F.window``/``F.session_window`` operators Structured Streaming uses, so
the batch queries here are the exact batch-equivalents of the streaming
versions in ``streaming/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.cache import tracked_persist
from airflow_postgres_to_s3_pipeline_spark.functions.numeric import int_hundredths
from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.functions.numeric import dsum

ORACLES: dict[str, str] = {}


def _oracle(name: str, sql: str):
    ORACLES[name] = sql


def window_nth_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nth_value navigation: each customer's 2nd-most-expensive order price
    alongside every order row (full-partition frame, deterministic total
    order)."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.nth_value("o_totalprice", 2).over(w).alias("second_highest_price"),
    )


_oracle(
    "window_nth_value",
    """
    SELECT o_custkey, o_orderkey, o_totalprice,
           nth_value(o_totalprice, 2) OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
           ) AS second_highest_price
    FROM orders
    """,
)


def window_ignore_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """last_value(..., ignoreNulls) navigation: carry forward each user's
    most recent high-value reading (values <= 50 nulled out) — the
    gap-carry-forward shape sensor/event pipelines use."""
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    high = F.when(F.col("value") > 50, F.col("value"))
    return e.select(
        "user_id",
        "event_id",
        "ts",
        "value",
        F.last(high, ignorenulls=True).over(w).alias("last_high_value"),
    )


_oracle(
    "window_ignore_nulls",
    """
    SELECT user_id, event_id, ts, value,
           last_value(CASE WHEN value > 50 THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS last_high_value
    FROM events
    """,
)


SESSION_GAP_MIN = 30  # interpolated into the oracle below — keep in lockstep


def sessionize_events(spark: SparkSession, sf_dir: str,
                      gap_minutes: int = SESSION_GAP_MIN) -> DataFrame:
    """Batch sessionization via lag + running sum (the window-function dual
    of F.session_window): a new session starts when the gap to the previous
    event exceeds the threshold.

    One shuffle on user_id serves both window passes AND the final
    (user_id, session_id) aggregate (its ClusteredDistribution is
    satisfied by the windows' HashPartitioning — plan-verified, one
    Exchange total; 660k events/s at 50M events, docs/SCALE.md).
    session_id is a per-user running count of session starts —
    deterministic under the (ts, event_id) total order.

    Hot-key ceiling: exact sessionization needs each user's FULL ordered
    timeline in one partition (the same inherent bound as
    asof_join_pandas), so a user carrying Θ(n) events serializes that
    partition's sort — no salt can split a running count.  Measure with
    key_skew_profile first; a bot-grade hub user should be capped or
    routed to the streaming tier (session_window with watermark), which
    bounds memory per user by gap eviction rather than timeline length.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    gap = F.col("ts").cast("double") - F.lag(F.col("ts").cast("double")).over(w)
    is_new = F.when(
        gap.isNull() | (gap >= gap_minutes * 60), F.lit(1)
    ).otherwise(F.lit(0))
    # derived from w, not restated — a tie-break column added to one
    # spec but not the other would silently break session-id determinism
    run = w.rowsBetween(Window.unboundedPreceding, 0)
    sessions = e.withColumn("session_id", F.sum(is_new).over(run))
    return (
        sessions.groupBy("user_id", "session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )


_oracle(
    "sessionize_events",
    f"""
    WITH flagged AS (
        SELECT user_id, ts, event_id,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR epoch(ts) - epoch(lag(ts) OVER w)
                            >= {SESSION_GAP_MIN * 60}
                    THEN 1 ELSE 0 END AS is_new
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), s AS (
        SELECT user_id, ts,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
           MIN(ts) AS session_start,
           MAX(ts) AS session_end,
           COUNT(*) AS n_events
    FROM s
    GROUP BY user_id, session_id
    """,
)


def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily cohort retention: users grouped by first-seen day, distinct
    active users per (cohort_day, day_offset).

    Two shuffles: the per-user first-day aggregate and the cohort count;
    the first-day side joins back broadcast-or-shuffle as AQE decides.
    """
    e = table(spark, sf_dir, "events")
    firsts = e.groupBy("user_id").agg(
        F.to_date(F.min("ts")).alias("cohort_day")
    )
    return (
        e.join(firsts, "user_id")
        .select(
            "cohort_day",
            F.datediff(F.to_date("ts"), "cohort_day").alias("day_offset"),
            "user_id",
        )
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


_oracle(
    "cohort_retention",
    """
    WITH firsts AS (
        SELECT user_id, CAST(MIN(ts) AS DATE) AS cohort_day
        FROM events GROUP BY user_id
    )
    SELECT cohort_day,
           CAST(date_diff('day', cohort_day, CAST(ts AS DATE)) AS INTEGER)
               AS day_offset,
           COUNT(DISTINCT e.user_id) AS active_users
    FROM events e JOIN firsts f ON e.user_id = f.user_id
    GROUP BY cohort_day, day_offset
    """,
)


def funnel_ordered_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-step funnel (view -> click -> purchase): per step, how many
    users reached it IN ORDER, and the mean latency from funnel entry.

    Step k's earliest qualifying time is the min event time at-or-after the
    user's step-(k-1) time, so out-of-order events (a purchase before the
    first view) never count — the property a naive per-type min would get
    wrong.

    Scale shape: a cascade of filtered aggregates, one user-keyed shuffle
    per step, each stage's frame shrinking to the surviving users; no
    windows over the raw fact, no per-user event lists.  Latency is an
    exact integer-microsecond sum with integer division (truncation on
    non-negative values matches DuckDB's floor division), so the result is
    bit-deterministic under any partitioning.
    """
    e = table(spark, sf_dir, "events").select("user_id", "event_type", "ts")

    s1 = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
    )
    s2 = (
        e.filter(F.col("event_type") == "click")
        .join(s1, "user_id")
        .filter(F.col("ts") >= F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"), F.min("t1").alias("t1"))
    )
    s3 = (
        e.filter(F.col("event_type") == "purchase")
        .join(s2.select("user_id", "t2", "t1"), "user_id")
        .filter(F.col("ts") >= F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"), F.min("t1").alias("t1"))
    )

    def step_row(df: DataFrame, label: str, end_col: str | None) -> DataFrame:
        if end_col is None:
            agg = df.agg(F.count(F.lit(1)).alias("n_users"))
            return agg.select(
                F.lit(label).alias("step"),
                "n_users",
                F.lit(None).cast("long").alias("avg_latency_us"),
            )
        lat = F.unix_micros(F.col(end_col)) - F.unix_micros(F.col("t1"))
        agg = df.agg(
            F.count(F.lit(1)).alias("n_users"),
            F.sum(lat).alias("lat_total"),
        )
        return agg.select(
            F.lit(label).alias("step"),
            "n_users",
            F.when(
                F.col("n_users") > 0,
                F.expr("lat_total div n_users"),
            ).alias("avg_latency_us"),
        )

    return (
        step_row(s1, "1_view", None)
        .unionByName(step_row(s2, "2_click", "t2"))
        .unionByName(step_row(s3, "3_purchase", "t3"))
    )


_oracle(
    "funnel_ordered_3step",
    """
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ), s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2, MIN(s1.t1) AS t1
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'click' AND e.ts >= s1.t1
        GROUP BY e.user_id
    ), s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3, MIN(s2.t1) AS t1
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'purchase' AND e.ts >= s2.t2
        GROUP BY e.user_id
    )
    SELECT '1_view' AS step, COUNT(*) AS n_users,
           CAST(NULL AS BIGINT) AS avg_latency_us
    FROM s1
    UNION ALL
    SELECT '2_click', COUNT(*),
           CASE WHEN COUNT(*) > 0 THEN
               CAST(SUM(epoch_us(t2) - epoch_us(t1)) AS BIGINT) // COUNT(*)
           END
    FROM s2
    UNION ALL
    SELECT '3_purchase', COUNT(*),
           CASE WHEN COUNT(*) > 0 THEN
               CAST(SUM(epoch_us(t3) - epoch_us(t1)) AS BIGINT) // COUNT(*)
           END
    FROM s3
    """,
)


def timeseries_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense hourly rollup per user with zero-filled gaps (hypertable-style).

    Sparse hourly counts are densified by generating each user's full hour
    range (``sequence`` + ``explode`` — rows expand in place, no shuffle)
    and left-joining the observed counts back.  Two shuffles total: the
    hourly aggregate and the dense-grid join, both keyed on (user, hour) —
    the shape survives any corpus size because the grid is bounded by
    span x cardinality, never by event count.  Users are bounded (< 20) to
    keep the oracle comparison small.
    """
    e = table(spark, sf_dir, "events").filter(F.col("user_id") < 20)
    hourly = (
        e.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("hour")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    span = hourly.groupBy("user_id").agg(
        F.min("hour").alias("h0"), F.max("hour").alias("h1")
    )
    grid = span.select(
        "user_id",
        F.explode(
            F.sequence("h0", "h1", F.expr("INTERVAL 1 HOUR"))
        ).alias("hour"),
    )
    return (
        grid.join(hourly, ["user_id", "hour"], "left")
        .select(
            "user_id",
            "hour",
            F.coalesce("n_events", F.lit(0)).alias("n_events"),
        )
    )


_oracle(
    "timeseries_gapfill",
    """
    WITH hourly AS (
        SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(*) AS n_events
        FROM events WHERE user_id < 20
        GROUP BY user_id, date_trunc('hour', ts)
    ), grid AS (
        SELECT user_id, UNNEST(generate_series(MIN(hour), MAX(hour),
                                               INTERVAL 1 HOUR)) AS hour
        FROM hourly
        GROUP BY user_id
    )
    SELECT g.user_id, g.hour, COALESCE(h.n_events, 0) AS n_events
    FROM grid g LEFT JOIN hourly h
      ON g.user_id = h.user_id AND g.hour = h.hour
    """,
)


def time_weighted_average(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of the event value (TWAP): each
    reading is weighted by how long it was current — the correct mean for
    irregularly-sampled telemetry/prices, where the plain AVG over-weights
    bursts.

    Each interval is [ts, next ts) via lead(); the last reading has no
    interval and drops out (standard left-continuous TWAP).  Determinism:
    values are exact 2-decimal quantities, so each weight accumulates as an
    INT64 of hundredth-microseconds (value x 100 is exact via a decimal
    hop; max ~1.3e17 per user against the 9.2e18 ceiling) — a giant
    DECIMAL sum cast to double diverges from DuckDB in the last ulp,
    whereas int64 -> double is the same well-defined round-to-nearest in
    both engines.  One shuffle on user_id shared by the window and the
    aggregate.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dt = F.lead(F.unix_micros("ts")).over(w) - F.unix_micros("ts")
    spans = e.select(
        "user_id",
        int_hundredths("value").alias("v_h"),
        dt.alias("dt_us"),
    ).filter(F.col("dt_us").isNotNull())
    agg = spans.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.sum("dt_us").alias("total_micros"),
        F.sum(F.col("v_h") * F.col("dt_us")).alias("wsum_h"),
    )
    return (
        agg.filter(F.col("total_micros") > 0)
        .select(
            "user_id",
            "n_intervals",
            "total_micros",
            (
                F.col("wsum_h").cast("double")
                / F.col("total_micros").cast("double")
                / F.lit(100.0)
            ).alias("twap"),
        )
    )


_oracle(
    "time_weighted_average",
    """
    WITH spans AS (
        SELECT user_id,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS v_h,
               epoch_us(lead(ts) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id))
                   - epoch_us(ts) AS dt_us
        FROM events
    ), agg AS (
        SELECT user_id,
               COUNT(*) AS n_intervals,
               CAST(SUM(dt_us) AS BIGINT) AS total_micros,
               CAST(SUM(v_h * dt_us) AS BIGINT) AS wsum_h
        FROM spans
        WHERE dt_us IS NOT NULL
        GROUP BY user_id
    )
    SELECT user_id, n_intervals, total_micros,
           CAST(wsum_h AS DOUBLE) / CAST(total_micros AS DOUBLE) / 100.0
               AS twap
    FROM agg
    WHERE total_micros > 0
    """,
)


def event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    counts and conditional probabilities of event_type -> next event_type.

    The product-analytics companion to the funnel: instead of fixed steps
    it measures EVERY adjacent pair under the deterministic (ts, event_id)
    total order.  One shuffle on user_id for the lead() window, one
    narrow-key shuffle on (from_type, to_type); the probability is a ratio
    of two int64 counts (single double division, bit-deterministic).
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        e.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
    )
    counts = pairs.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )
    outgoing = counts.groupBy("from_type").agg(
        F.sum("n_transitions").alias("n_out")
    )
    return (
        counts.join(outgoing, "from_type")
        .select(
            "from_type",
            "to_type",
            "n_transitions",
            (
                F.col("n_transitions").cast("double")
                / F.col("n_out").cast("double")
            ).alias("p_transition"),
        )
    )


_oracle(
    "event_transitions",
    """
    WITH pairs AS (
        SELECT event_type AS from_type,
               lead(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS to_type
        FROM events
    ), counts AS (
        SELECT from_type, to_type, COUNT(*) AS n_transitions
        FROM pairs WHERE to_type IS NOT NULL
        GROUP BY from_type, to_type
    ), outgoing AS (
        SELECT from_type, CAST(SUM(n_transitions) AS BIGINT) AS n_out
        FROM counts GROUP BY from_type
    )
    SELECT c.from_type, c.to_type, c.n_transitions,
           CAST(c.n_transitions AS DOUBLE) / CAST(o.n_out AS DOUBLE)
               AS p_transition
    FROM counts c JOIN outgoing o USING (from_type)
    """,
)


def user_value_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user least-squares trend (slope + intercept) of event value over
    time — grouped linear regression, the per-key ML-lite aggregate
    engines expose as REGR_SLOPE/REGR_INTERCEPT.

    The built-in regr_* aggregates accumulate doubles (order-dependent at
    scale), so this computes the closed form from EXACT integer sums:
    x = whole seconds since the user's first event (shift-invariant slope),
    y = value in exact hundredths; sum(x), sum(y), sum(xy), sum(x^2) are
    all int64 within proven bounds (sxy <= ~4e14, sxx <= ~2e16 vs the
    9.2e18 ceiling).  The cross terms n*sxy and sx*sy WOULD overflow
    int64 (~6e19), so the closed form is evaluated in doubles from the
    exact sums — every int64 -> double cast, multiply, and subtract is
    IEEE round-to-nearest, identical in both engines, so the result is
    still bit-deterministic under any partitioning.  Slope unit: value
    per second (hundredths cancel in the ratio).  One user_id shuffle for
    the min-ts window, one for the aggregate.
    """
    e = table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    x = (
        (F.unix_micros("ts") - F.min(F.unix_micros("ts")).over(w))
        / F.lit(1_000_000)
    ).cast("long")
    y = int_hundredths("value")
    obs = e.select("user_id", x.alias("x"), y.alias("y"))
    agg = obs.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sy_d = F.col("sy").cast("double")
    num = n_d * F.col("sxy").cast("double") - sx_d * sy_d
    den = n_d * F.col("sxx").cast("double") - sx_d * sx_d
    slope = num / den / F.lit(100.0)
    intercept = sy_d / n_d / F.lit(100.0) - slope * (sx_d / n_d)
    return (
        agg.filter((F.col("n") >= 2) & (den != 0))
        .select(
            "user_id",
            "n",
            slope.alias("slope_per_sec"),
            intercept.alias("intercept"),
        )
    )


_oracle(
    "user_value_trend",
    """
    WITH obs AS (
        SELECT user_id,
               CAST((epoch_us(ts)
                     - MIN(epoch_us(ts)) OVER (PARTITION BY user_id))
                    // 1000000 AS BIGINT) AS x,
               CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS y
        FROM events
    ), agg AS (
        SELECT user_id,
               COUNT(*) AS n,
               CAST(SUM(x) AS BIGINT) AS sx,
               CAST(SUM(y) AS BIGINT) AS sy,
               CAST(SUM(x * y) AS BIGINT) AS sxy,
               CAST(SUM(x * x) AS BIGINT) AS sxx
        FROM obs GROUP BY user_id
    )
    SELECT user_id, n,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0
               AS slope_per_sec,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) / 100.0
               - ((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) / 100.0)
                 * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
               AS intercept
    FROM agg
    WHERE n >= 2
      AND CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
          - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) <> 0
    """,
)


def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist of customer balances within each nation.

    The (c_acctbal, c_custkey) order is total, so rank-derived ratios are
    exact integer divisions — deterministic on both engines.
    """
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_nationkey",
        "c_acctbal",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
    )


_oracle(
    "window_percent_rank",
    """
    SELECT c_custkey, c_nationkey, c_acctbal,
           percent_rank() OVER w AS pct_rank,
           cume_dist()    OVER w AS cume
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
)


# ---------------------------------------------------------------------------
# E11: ranking windows + top-k per group
# ---------------------------------------------------------------------------

def window_topk_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number + filter)."""
    o = table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.select(
            "o_custkey",
            "o_orderkey",
            "o_totalprice",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


_oracle(
    "window_topk_per_customer",
    """
    SELECT * FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
               CAST(ROW_NUMBER() OVER w AS INTEGER) AS rn,
               CAST(RANK() OVER w AS INTEGER) AS rnk,
               CAST(DENSE_RANK() OVER w AS INTEGER) AS drnk
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    ) WHERE rn <= 3
    """,
)


def window_ntile_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quartile bucket of each customer's balance within its segment."""
    c = table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").asc(), F.col("c_custkey").asc()
    )
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
    )


_oracle(
    "window_ntile_quartiles",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           CAST(NTILE(4) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal ASC, c_custkey ASC) AS INTEGER) AS quartile
    FROM customer
    """,
)


# ---------------------------------------------------------------------------
# E12: analytic windows (lag/lead/first/last) + running frames
# ---------------------------------------------------------------------------

def window_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer order timeline: running spend, lag/lead, first/last.

    The running frame folds left-to-right over a deterministic sort order,
    so the double additions are order-stable and match the oracle.
    """
    o = table(spark, sf_dir, "orders")
    ws = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    wrun = ws.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    wall = ws.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast("decimal(27,2)")).over(wrun)
        .cast("double")
        .alias("running_spend"),
        F.lag("o_totalprice", 1).over(ws).alias("prev_price"),
        F.lead("o_totalprice", 1).over(ws).alias("next_price"),
        F.first("o_totalprice").over(wall).alias("first_price"),
        F.last("o_totalprice").over(wall).alias("last_price"),
    )


_oracle(
    "window_running_total",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend,
           LAG(o_totalprice, 1) OVER w AS prev_price,
           LEAD(o_totalprice, 1) OVER w AS next_price,
           FIRST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_price,
           LAST_VALUE(o_totalprice) OVER (PARTITION BY o_custkey
                 ORDER BY o_orderdate ASC, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC, o_orderkey ASC)
    """,
)


# ---------------------------------------------------------------------------
# E22 batch-equivalents: tumbling / sliding time windows over events
# ---------------------------------------------------------------------------

def tumbling_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window event stats (same operator streaming uses)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


_oracle(
    "tumbling_window_agg",
    """
    SELECT date_trunc('hour', ts) AS window_start,
           date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
    FROM events
    GROUP BY 1, 2, 3
    """,
)


def sliding_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour windows sliding every 30 minutes (each event in 2 windows)."""
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
        )
    )


# DuckDB mirror: every event belongs to the 30-min-aligned window that starts
# at floor(ts/30min) and the one 30 minutes earlier.
_oracle(
    "sliding_window_agg",
    """
    WITH buckets AS (
        SELECT make_timestamp(CAST(floor(epoch(ts) / 1800) * 1800 * 1000000 AS BIGINT)) AS window_start
        FROM events
        UNION ALL
        SELECT make_timestamp(CAST((floor(epoch(ts) / 1800) - 1) * 1800 * 1000000 AS BIGINT)) AS window_start
        FROM events
    )
    SELECT window_start, COUNT(*) AS n_events
    FROM buckets
    GROUP BY window_start
    """,
)


# ---------------------------------------------------------------------------
# E23 batch-equivalent: gap-based session windows
# ---------------------------------------------------------------------------

def session_window_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user sessions with a 30-minute inactivity gap.

    Uses Spark's native ``session_window`` operator (the same one Structured
    Streaming uses for stateful sessionization).  A session closes when the
    next event is >= 30 minutes after the previous; session_end is
    last_event + gap.
    """
    e = table(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value", 4).alias("sum_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "sum_value",
        )
    )


_oracle(
    "session_window_agg",
    """
    WITH flagged AS (
        SELECT user_id, ts, value,
               CASE WHEN lag(ts) OVER w IS NULL
                         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                    THEN 1 ELSE 0 END AS new_session
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM flagged
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(27,4))) AS DOUBLE) AS sum_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)


# ---------------------------------------------------------------------------
# E12b: RANGE frames (value-based windows)
# ---------------------------------------------------------------------------

def window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders placed in the 30 days up to each order (RANGE frame on epoch
    seconds) — the value-based frame variant of E12."""
    o = table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, 0)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.count(F.lit(1)).over(w).alias("orders_in_30d"),
        F.sum(F.col("o_totalprice").cast("decimal(27,2)"))
        .over(w)
        .cast("double")
        .alias("spend_in_30d"),
    )


_oracle(
    "window_range_frame",
    """
    SELECT o_custkey, o_orderkey, o_orderdate,
           COUNT(*) OVER w AS orders_in_30d,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(27,2))) OVER w AS DOUBLE) AS spend_in_30d
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY CAST(epoch(o_orderdate) AS BIGINT)
                 RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW)
    """,
)


# ---------------------------------------------------------------------------
# As-of style: latest prior event of a given type (time-series enrichment)
# ---------------------------------------------------------------------------

def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For every event, the timestamp of the user's most recent purchase at
    or before it — the as-of-join pattern expressed as last_value(ignore
    nulls) over a running frame (single shuffle on user_id; no range join).
    """
    e = table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    purchase_ts = F.when(F.col("event_type") == "purchase", F.col("ts"))
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        F.last(purchase_ts, ignorenulls=True).over(w).alias("last_purchase_ts"),
    )


_oracle(
    "asof_last_purchase",
    """
    SELECT event_id, user_id, ts, event_type,
           LAST_VALUE(CASE WHEN event_type = 'purchase' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_ts
    FROM events
    """,
)


def hypertable_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-granularity continuous-aggregate rollup (hypertable style):
    hourly and daily buckets per event_type from ONE scan of events.

    The daily tier re-aggregates the hourly PARTIALS (sum of counts, min of
    mins, max of maxs) rather than re-scanning events — the
    continuous-aggregate/materialized-rollup pattern: at 100 TB the raw
    scan happens once and every coarser granularity derives from the next
    finer one at bucket cardinality, not event cardinality.  The hourly
    frame is persisted because both union branches reference it (Spark
    would otherwise recompute the scan per branch).  Only mergeable
    aggregates are used (count/min/max) — count-distinct does not
    re-aggregate and would need a sketch tier (see hll_sketch_users).
    """
    e = table(spark, sf_dir, "events")
    hourly = (
        e.groupBy("event_type", F.date_trunc("hour", "ts").alias("bucket_start"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("value").alias("min_value"),
            F.max("value").alias("max_value"),
        )
    )
    hourly = tracked_persist(hourly)
    daily = (
        hourly.groupBy(
            "event_type",
            F.date_trunc("day", "bucket_start").alias("bucket_start"),
        )
        .agg(
            F.sum("n_events").alias("n_events"),
            F.min("min_value").alias("min_value"),
            F.max("max_value").alias("max_value"),
        )
    )
    lit_g = lambda g: F.lit(g).alias("granularity")  # noqa: E731
    return hourly.select(
        lit_g("hour"), "event_type", "bucket_start",
        "n_events", "min_value", "max_value",
    ).unionByName(
        daily.select(
            lit_g("day"), "event_type", "bucket_start",
            "n_events", "min_value", "max_value",
        )
    )


_oracle(
    "hypertable_rollup",
    """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS bucket_start,
               COUNT(*) AS n_events, MIN(value) AS min_value,
               MAX(value) AS max_value
        FROM events GROUP BY event_type, date_trunc('hour', ts)
    )
    SELECT 'hour' AS granularity, event_type, bucket_start,
           n_events, min_value, max_value
    FROM hourly
    UNION ALL
    SELECT 'day' AS granularity, event_type,
           date_trunc('day', bucket_start) AS bucket_start,
           CAST(SUM(n_events) AS BIGINT) AS n_events,
           MIN(min_value) AS min_value, MAX(max_value) AS max_value
    FROM hourly
    GROUP BY event_type, date_trunc('day', bucket_start)
    """,
)


ASOF_TOLERANCE_MIN = 60
# applyInPandas makes ONE Python call per distinct group key, and each
# group's rows materialize as ONE pandas DataFrame in that call — so the
# bucket count must scale with data volume or per-call memory grows
# linearly with the corpus (r7 ADVICE: a fixed 64 meant 1/64 of the WHOLE
# events table per call).  Bucket count is derived as
# ceil(n_rows / ASOF_TARGET_ROWS_PER_BUCKET), floored at ASOF_MIN_BUCKETS
# so small corpora still spread across the cluster.
ASOF_MIN_BUCKETS = 64
ASOF_TARGET_ROWS_PER_BUCKET = 200_000


def _parquet_row_count(sf_dir: str, name: str) -> int:
    """Row count from the parquet FOOTERS (driver-side metadata, ~ms) —
    sizing the as-of buckets used to run an EAGER full e.count() Spark
    job at DataFrame-construction time, i.e. a whole extra pass over the
    fact table before the operator's one real shuffle (r9 review).
    Falls back to -1 when the path isn't local parquet (caller then uses
    a parallelism-derived default)."""
    import glob
    import os

    try:
        import pyarrow.parquet as pq

        # Recursive glob so a partitioned/nested parquet layout counts ALL
        # leaf files instead of silently undercounting via a top-level-only
        # scan (ADVICE r9) — an undercount is positive-but-wrong and skips
        # the -1 fallback that would engage the parallelism default.
        # Skip any path component starting with '_' or '.' (the same rule
        # Spark's file index applies): a crashed write leaves orphaned
        # part files under _temporary/, and counting them would OVERcount
        # (r10 review) — committed data never lives under such segments.
        base = os.path.join(sf_dir, f"{name}.parquet")
        files = [
            f
            for f in glob.glob(
                os.path.join(base, "**", "*.parquet"), recursive=True
            )
            if not any(
                part.startswith(("_", "."))
                for part in os.path.relpath(f, base).split(os.sep)
            )
        ]
        if not files:
            single = os.path.join(sf_dir, f"{name}.parquet")
            files = [single] if os.path.isfile(single) else []
        if not files:
            return -1
        return sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    except Exception:
        return -1


def asof_bucket_count(n_rows: int) -> int:
    """Buckets sized to ~ASOF_TARGET_ROWS_PER_BUCKET rows each (bounded
    per-call pandas memory), never fewer than ASOF_MIN_BUCKETS.  Results
    are bucket-count-invariant: hashing user_id keeps every user's rows
    in one bucket and merge_asof(by='user_id') is per-user."""
    return max(
        ASOF_MIN_BUCKETS,
        -(-n_rows // ASOF_TARGET_ROWS_PER_BUCKET),  # ceil div
    )


def asof_join_pandas(spark: SparkSession, sf_dir: str,
                     tolerance_minutes: int = ASOF_TOLERANCE_MIN) -> DataFrame:
    """Tolerance-bounded as-of join via ``pandas.merge_asof`` inside
    ``applyInPandas`` — the Arrow-batched custom-operator tier for as-of
    semantics (each event matched to the user's latest purchase no older
    than ``tolerance_minutes``).

    Scale shape: ONE shuffle — but on a hash-bucket of user_id, not
    user_id itself: ``applyInPandas`` makes one Python/Arrow call per
    DISTINCT GROUP KEY (exactly n_buckets calls in total, each receiving
    that bucket's complete rows as one pandas DataFrame), so grouping by
    raw user_id pays per-call overhead times the number of users
    (measured 5.9s vs 0.7s at sf0.1's 1500 users x 67 events), while too
    FEW buckets concentrates the corpus into giant per-call frames.  The
    bucket count therefore scales with input size
    (``asof_bucket_count``: ~ASOF_TARGET_ROWS_PER_BUCKET rows per call,
    floored at ASOF_MIN_BUCKETS; row count read from parquet footers,
    never an eager Spark job), keeping per-call pandas memory bounded —
    PROVIDED no single user dominates: hashing keeps each user's whole
    timeline in one bucket (merge_asof(by=user) needs it), so the true
    per-call ceiling is max-rows-per-user, and a 5M-event hot key would
    materialize 5M pandas rows in one call whatever the bucket count.
    Measure with key_skew_profile first; a hot-key corpus needs the
    window formulation (asof_last_purchase), which has no such ceiling.  Each bucket handles all its users in one
    ``pd.merge_asof(..., by="user_id")`` — a single sorted linear merge
    per bucket, identical per-user backward-tolerance semantics.  This is
    the escape hatch to reach pandas' tolerance/direction as-of variants
    that the pure-window formulation (``asof_last_purchase``) does not
    cover; the oracle pins it to an interval RANGE-frame MAX, so the
    Python tier is hash-checked, not trusted.
    """
    e = table(spark, sf_dir, "events").select(
        "event_id", "user_id", "ts", "event_type"
    )
    n_rows = _parquet_row_count(sf_dir, "events")
    if n_rows < 0:  # non-parquet source: spread by cluster width instead
        n_rows = (
            spark.sparkContext.defaultParallelism * ASOF_TARGET_ROWS_PER_BUCKET
        )
    n_buckets = asof_bucket_count(n_rows)

    def asof(pdf):
        import pandas as pd

        pdf = pdf.sort_values(["ts", "event_id"])
        pur = (
            pdf.loc[pdf["event_type"] == "purchase", ["user_id", "ts"]]
            .rename(columns={"ts": "last_purchase_ts"})
            .sort_values("last_purchase_ts")
        )
        out = pd.merge_asof(
            pdf,
            pur,
            left_on="ts",
            right_on="last_purchase_ts",
            by="user_id",
            direction="backward",
            allow_exact_matches=True,
            tolerance=pd.Timedelta(minutes=tolerance_minutes),
        )
        return out[
            ["event_id", "user_id", "ts", "event_type", "last_purchase_ts"]
        ]

    bucket = F.pmod(F.hash("user_id"), F.lit(n_buckets))
    return (
        e.withColumn("_bucket", bucket)
        .groupBy("_bucket")
        .applyInPandas(
            asof,
            "event_id long, user_id long, ts timestamp, "
            "event_type string, last_purchase_ts timestamp",
        )
    )


_oracle(
    "asof_join_pandas",
    f"""
    SELECT event_id, user_id, ts, event_type,
           MAX(CASE WHEN event_type = 'purchase' THEN ts END) OVER (
               PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL {ASOF_TOLERANCE_MIN} MINUTES PRECEDING
                         AND CURRENT ROW) AS last_purchase_ts
    FROM events
    """,
)
