"""Python UDF surface (SURVEY.md §2B E21, §2C).

The reference's only "UDF" is a per-file pandas preprocess step
(dags/airbnb_postgres_to_s3.py:41-47); here the same escape hatch is exposed
the Spark-native way, in preference order:

1. built-in functions (always first choice — see scalar_funcs.py),
2. ``@pandas_udf`` — Arrow-batched, vectorized, ~10-100x faster than
   row-at-a-time ``F.udf``,
3. ``applyInPandas`` for grouped UDAF-style transforms,
4. row-at-a-time ``F.udf`` kept only as a demonstration of the slow path.

Each query still has a SQL oracle: the UDF bodies are chosen to be
re-expressible in ANSI SQL so correctness is hash-checked end-to-end.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType, LongType, StringType

from airflow_postgres_to_s3_pipeline_spark.catalog import table

ORACLES: dict[str, str] = {}


def _oracle(name: str, sql: str):
    ORACLES[name] = sql


@F.pandas_udf(DoubleType())
def _sigmoid_score(totalprice: pd.Series) -> pd.Series:
    """Vectorized logistic score of order price (numpy under the hood)."""
    import numpy as np

    return 1.0 / (1.0 + np.exp(-(totalprice - 100000.0) / 50000.0))


def pandas_udf_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched scalar pandas UDF over orders (the fast Python path)."""
    o = table(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.round(_sigmoid_score("o_totalprice"), 6).alias("score"),
    )


_oracle(
    "pandas_udf_score",
    """
    SELECT o_orderkey,
           ROUND(1.0 / (1.0 + EXP(-(o_totalprice - 100000.0) / 50000.0)), 6) AS score
    FROM orders
    """,
)


def python_udf_rowwise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF (the slow path, kept for API parity).

    Same result as a built-in expression; at scale prefer pandas_udf_score's
    shape — this one serializes row-by-row through Python.
    """
    tier = F.udf(
        lambda bal: "negative" if bal < 0 else ("gold" if bal > 7500 else "standard"),
        StringType(),
    )
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", tier("c_acctbal").alias("tier"))


_oracle(
    "python_udf_rowwise",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal > 7500 THEN 'gold'
                ELSE 'standard' END AS tier
    FROM customer
    """,
)


def arrow_udf_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-optimized Python UDF (``useArrow=True``, Spark 4): same logical
    function as python_udf_rowwise but batched over Arrow instead of pickled
    row-by-row — the drop-in upgrade when a scalar Python UDF can't be
    rewritten as a pandas UDF."""
    tier = F.udf(
        lambda bal: "negative" if bal < 0 else ("gold" if bal > 7500 else "standard"),
        StringType(),
        useArrow=True,
    )
    c = table(spark, sf_dir, "customer")
    return c.select("c_custkey", tier("c_acctbal").alias("tier"))


_oracle(
    "arrow_udf_tier",
    """
    SELECT c_custkey,
           CASE WHEN c_acctbal < 0 THEN 'negative'
                WHEN c_acctbal > 7500 THEN 'gold'
                ELSE 'standard' END AS tier
    FROM customer
    """,
)


def apply_in_pandas_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped applyInPandas: z-score of customer balance within segment,
    emitted as FLOOR(z * 1e4) bigint.

    The group key (mktsegment) is low-cardinality but each group fits
    executor memory by construction at any SF (bounded customers/segment x
    fixed row width); for unbounded groups use window functions instead
    (see windows.py) — noted here because applyInPandas materializes each
    group in one pandas frame.

    Determinism (r10 review — the old pandas mean/std + round(4) relied on
    the corpus avoiding ties: pandas pairwise summation vs DuckDB streaming
    AVG/STDDEV differ in trailing ULPs, round is half-even in pandas vs
    half-away in DuckDB, and a 1-row group gave NaN vs NULL).  Now both
    engines compute the SAME exact integer moments in the cents domain
    (c_acctbal is DECIMAL(15,2), so cents are exact int64; sums/squares in
    Python ints / HUGEINT — no overflow, no float accumulation), then
    evaluate one identically-spelled IEEE expression
        z = (A/n) / sqrt(D/m),  A = x*n - S,  D = Q*n - S^2,  m = n*(n-1)
    whose inputs are exactly-rounded doubles of exact ints — bit-identical
    on any engine — and FLOOR has no tie cases (functions/numeric.py).
    Degenerate groups (n < 2 or zero variance) yield NULL on both sides.
    """
    schema = StructType(
        [
            StructField("c_custkey", LongType()),
            StructField("c_mktsegment", StringType()),
            StructField("z_micro", LongType()),
        ]
    )

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        import math

        # exact integer moments: values are DECIMAL(15,2) -> cents fit
        # int64; Python-int accumulation is exact at any group size
        cents = [int(round(float(v) * 100.0)) for v in pdf["c_acctbal"]]
        n = len(cents)
        s = sum(cents)
        q = sum(v * v for v in cents)
        d = q * n - s * s
        m = n * (n - 1)
        if n < 2 or d <= 0:
            z_micro = [None] * n
        else:
            denom = math.sqrt(float(d) / float(m))
            z_micro = [
                math.floor(
                    (float(x * n - s) / float(n)) / denom * 10000.0
                )
                for x in cents
            ]
        return pd.DataFrame(
            {
                "c_custkey": pdf["c_custkey"],
                "c_mktsegment": pdf["c_mktsegment"],
                "z_micro": pd.array(z_micro, dtype="Int64"),
            }
        )

    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(zscore, schema)


_oracle(
    "apply_in_pandas_zscore",
    """
    WITH cents AS (
        SELECT c_custkey, c_mktsegment,
               CAST(c_acctbal * 100 AS BIGINT) AS c
        FROM customer
    ), g AS (
        SELECT c_mktsegment,
               COUNT(*) AS n,
               SUM(CAST(c AS HUGEINT)) AS s,
               SUM(CAST(c AS HUGEINT) * c) AS q
        FROM cents GROUP BY c_mktsegment
    )
    SELECT c.c_custkey, c.c_mktsegment,
           CASE WHEN g.n >= 2 AND (g.q * g.n - g.s * g.s) > 0 THEN
               CAST(FLOOR(
                   (CAST(CAST(c.c AS HUGEINT) * g.n - g.s AS DOUBLE)
                        / CAST(g.n AS DOUBLE))
                   / sqrt(CAST(g.q * g.n - g.s * g.s AS DOUBLE)
                        / CAST(g.n * (g.n - 1) AS DOUBLE))
                   * 10000.0
               ) AS BIGINT)
           ELSE NULL END AS z_micro
    FROM cents c JOIN g USING (c_mktsegment)
    """,
)


def arrow_group_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped ``applyInArrow`` (Spark 4): per-segment min-max
    normalization computed directly on pyarrow RecordBatches — the
    zero-copy tier below ``applyInPandas`` (no pandas conversion on
    either side of the worker boundary; pyarrow.compute kernels are the
    same vectorized C++ Arrow uses everywhere).

    Output is floor((bal - lo) / (hi - lo) * 1e6) as a bigint: the ratio
    is one IEEE divide of exactly-representable two-decimal inputs, so it
    is bit-identical in any engine, and FLOOR (unlike rounding) has no
    tie cases — the determinism rule from functions/numeric.py.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def normalize(t: pa.Table) -> pa.Table:
        bal = pc.cast(t.column("c_acctbal"), pa.float64())
        lo = pc.min(bal)
        hi = pc.max(bal)
        if pc.equal(hi, lo).as_py():
            micro = pa.array([0] * len(t), pa.int64())
        else:
            ratio = pc.divide(pc.subtract(bal, lo), pc.subtract(hi, lo))
            micro = pc.cast(
                pc.floor(pc.multiply(ratio, pa.scalar(1e6))), pa.int64()
            )
        return pa.table(
            {
                "c_custkey": t.column("c_custkey"),
                "c_mktsegment": t.column("c_mktsegment"),
                "norm_micro": micro,
            }
        )

    c = table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInArrow(
        normalize, "c_custkey long, c_mktsegment string, norm_micro long"
    )


_oracle(
    "arrow_group_normalize",
    """
    SELECT c_custkey, c_mktsegment,
           CASE WHEN MAX(c_acctbal) OVER w = MIN(c_acctbal) OVER w THEN 0
                ELSE CAST(FLOOR(
                    (c_acctbal - MIN(c_acctbal) OVER w)
                    / (MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w)
                    * 1000000.0) AS BIGINT)
           END AS norm_micro
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment)
    """,
)


def map_in_arrow_price_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow`` (Spark 4): streaming per-RecordBatch transform with
    NO grouping — the partition-map sibling of ``arrow_group_normalize``
    (grouped) and ``arrow_udf_tier`` (scalar), completing the Arrow UDF
    surface.  Batches stream through the Python worker one at a time, so
    peak memory is one Arrow batch regardless of partition size — the
    property that matters when a 100 TB scan feeds Python feature
    extraction (same execution shape as the multimodal mapInPandas
    decoders, minus the pandas conversion on both edges).

    The body is pure pyarrow.compute (floor-divide bucketing — exact
    integer semantics, no rounding tie cases), so the entry keeps a full
    SQL oracle like every other UDF-tier demonstration.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def tier(batches):
        for b in batches:
            price = pc.cast(b.column(1), pa.float64())
            bucket = pc.cast(
                pc.floor(pc.divide(price, pa.scalar(25000.0))), pa.int64()
            )
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0),
                    bucket,
                    pc.greater_equal(price, pa.scalar(200000.0)),
                ],
                names=["o_orderkey", "price_bucket", "is_high_value"],
            )

    o = table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return o.mapInArrow(
        tier, "o_orderkey long, price_bucket long, is_high_value boolean"
    )


_oracle(
    "map_in_arrow_price_tier",
    """
    SELECT o_orderkey,
           CAST(FLOOR(o_totalprice / 25000.0) AS BIGINT) AS price_bucket,
           o_totalprice >= 200000.0 AS is_high_value
    FROM orders
    """,
)


# ---------------------------------------------------------------------------
# E21d: Python UDTF (table function) — one input row -> many output rows
# ---------------------------------------------------------------------------

@F.udtf(returnType="word: string, word_len: int")
class ExpandWords:
    """UDTF splitting a document into (word, length) rows.

    The UDTF path is for row-expansion logic too irregular for
    ``explode``; for plain splitting the built-in explode (see
    explode_word_freq) stays JVM-side and is preferred — this exists for
    API-surface parity and is oracle-checked all the same.
    """

    def eval(self, text: str):  # noqa: D102
        for w in text.split(" "):
            if w:
                yield w, len(w)


def python_udtf_word_expand(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    # lateral join: one row per word per document
    return (
        d.lateralJoin(ExpandWords(F.col("text").outer()))
        .groupBy("word_len")
        .agg(F.count(F.lit(1)).alias("n_words"))
    )


_oracle(
    "python_udtf_word_expand",
    """
    SELECT CAST(LENGTH(word) AS INTEGER) AS word_len, COUNT(*) AS n_words
    FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents)
    WHERE LENGTH(word) > 0
    GROUP BY 1
    """,
)


@F.udtf
class LeadingWords:
    """POLYMORPHIC UDTF (Spark 4 ``analyze()``): output schema computed at
    PLAN TIME from the constant ``k`` argument — k string columns
    ``w1..wk``.  This is the table-function tier static ``returnType``
    cannot express (a wide-format extractor whose arity is a query
    parameter); Catalyst resolves the schema before execution, so
    downstream projections/pushdowns see ordinary columns."""

    @staticmethod
    def analyze(text, k):
        from pyspark.sql.types import StringType, StructType
        from pyspark.sql.udtf import AnalyzeResult

        if k.value is None:
            raise ValueError("k must be a constant literal")
        schema = StructType()
        for j in range(int(k.value)):
            schema = schema.add(f"w{j + 1}", StringType())
        return AnalyzeResult(schema=schema)

    def eval(self, text: str, k: int):  # noqa: D102
        words = [w for w in text.split(" ") if w][: int(k)]
        yield tuple(words + [None] * (int(k) - len(words)))


def python_udtf_polymorphic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-3-words wide extraction via the polymorphic UDTF: one output
    row per document, column count decided by ``analyze()`` from the
    constant argument."""
    d = table(spark, sf_dir, "documents")
    return d.lateralJoin(
        LeadingWords(F.col("text").outer(), F.lit(3))
    ).select("doc_id", "w1", "w2", "w3")


_oracle(
    "python_udtf_polymorphic",
    """
    SELECT doc_id,
           CASE WHEN LEN(parts) >= 1 THEN parts[1] END AS w1,
           CASE WHEN LEN(parts) >= 2 THEN parts[2] END AS w2,
           CASE WHEN LEN(parts) >= 3 THEN parts[3] END AS w3
    FROM (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> LEN(x) > 0) AS parts
        FROM documents
    )
    """,
)


INFERENCE_DIM = 64
INFERENCE_TOL = 1e-9
"""Invariant tolerance for the model-inference gate: numpy's pairwise /
BLAS accumulation differs from a left-to-right fold only in trailing
ULPs (~3e-12 worst case at dim=64 on unit-scale inputs), so 1e-9 has
~300x headroom while still failing on any real defect (wrong weights,
swapped column, truncated vector)."""


def _inference_weights() -> list[float]:
    """The pinned linear 'model': w_j = ((j * 37) % 19 - 9) / 10 — runs
    are reproducible without shipping artifacts, and the first two
    weights give the direction probes below known opposite-sign slopes
    (w_0 = -0.9 decreasing, w_1 = +0.9 increasing)."""
    return [((j * 37) % 19 - 9) / 10.0 for j in range(INFERENCE_DIM)]


def _score_udf():
    """The vectorized scorer (numpy matmul per Arrow batch), built once
    per plan so the serving path and the gate share one definition."""
    import numpy as np

    w = np.array(_inference_weights())

    @F.pandas_udf(DoubleType())
    def score(vecs: pd.Series) -> pd.Series:
        mat = np.stack(vecs.to_numpy())
        return pd.Series(mat @ w)

    return score


def model_scores_raw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch model inference over embeddings — THE SERVING PATH: a
    deterministic linear model scored with a vectorized pandas UDF (numpy
    matmul per Arrow batch), the shape every embedding-classifier /
    reward-model scoring job has at 100 TB.  One inference per row and
    no gate-only columns (r10 review): the probe inferences and the
    embedding copy live in ``model_inference_scores``.  The raw floats
    carry no exact oracle (numpy's pairwise summation differs from a SQL
    fold in final ULPs) — equivalence with a driver-side numpy reference
    is pinned in tests/test_udfs_inference.py."""
    score = _score_udf()
    e = table(spark, sf_dir, "embeddings")
    return e.select(
        "vec_id",
        "label",
        score(F.col("embedding").cast("array<double>")).alias("model_score"),
    )


def _bump_feature(v, j: int):
    """``v`` with feature ``j`` incremented by 1.0 — the input
    perturbation of the direction probes."""
    return F.concat(
        F.slice(v, 1, j),
        F.array(F.element_at(v, j + 1) + F.lit(1.0)),
        F.slice(v, j + 2, INFERENCE_DIM - j - 1),
    )


def model_inference_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The registry gate for the inference path, upgraded from rows-only
    to a FULL invariant oracle (r9 verdict task 5): the raw numpy scores
    have no bit-exact SQL form, but behavioral invariants of the pinned
    linear model do — each computed Spark-side FROM real UDF output, so a
    wrong weight vector, a swapped column, or a truncated embedding flips
    a boolean and fails the driver's hash gate, while the oracle asserts
    the mathematically-guaranteed truth:

    - ``matches_exact_linear``: the UDF score equals the exact left-fold
      sum(w_j * x_j) within a SCALE-AWARE tolerance (the model is
      actually computed, per row).  This subsumes any score bound: a
      score within tol of the fold is within tol of sum |w_j x_j|.
      Tolerance is INFERENCE_TOL * (1 + sum|w_j x_j|) so the gate holds
      on any input scale — a fixed absolute tol would false-fail on
      large-magnitude embeddings whose ULP error exceeds it (r10
      review);
    - ``f0_direction_ok`` / ``f1_direction_ok``: re-scoring with feature
      0 (then 1) incremented by 1.0 moves the score by exactly w_0 =
      -0.9 / w_1 = +0.9 within the same tolerance — monotonicity with
      pinned opposite-sign slopes along two pinned features, each an
      independent end-to-end inference through the UDF.

    Row-count identity and vec_id/label exactness come from the oracle's
    one-row-per-embedding projection.  Raw scores for downstream use:
    ``model_scores_raw`` (which stays one-inference-per-row; the two
    probe inferences are paid only here, in the gate).
    """
    weights = _inference_weights()
    score = _score_udf()
    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    scored = e.select(
        "vec_id",
        "label",
        v.alias("v"),
        score(v).alias("s"),
        score(_bump_feature(v, 0)).alias("s_f0"),
        score(_bump_feature(v, 1)).alias("s_f1"),
    )
    w_arr = F.array(*[F.lit(wj) for wj in weights])
    terms = F.zip_with(F.col("v"), w_arr, lambda a, b: a * b)
    fold = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    l1 = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + F.abs(x))
    tol = F.lit(INFERENCE_TOL) * (F.lit(1.0) + l1)
    return scored.select(
        "vec_id",
        "label",
        (F.abs(F.col("s") - fold) <= tol).alias("matches_exact_linear"),
        (F.abs((F.col("s_f0") - F.col("s")) - F.lit(weights[0])) <= tol)
        .alias("f0_direction_ok"),
        (F.abs((F.col("s_f1") - F.col("s")) - F.lit(weights[1])) <= tol)
        .alias("f1_direction_ok"),
    )


_oracle(
    "model_inference_scores",
    """
    SELECT vec_id,
           label,
           true AS matches_exact_linear,
           true AS f0_direction_ok,
           true AS f1_direction_ok
    FROM embeddings
    """,
)


@F.pandas_udf(DoubleType())
def _median_udaf(v: pd.Series) -> float:
    """GROUPED_AGG pandas UDF (Series -> scalar): exact median.
    Order-independent by construction (pandas sorts internally), so the
    result is deterministic under any shuffle/partitioning — the property
    a float-sum UDAF would NOT have."""
    return float(v.median())


@F.pandas_udf(LongType())
def _count_udaf(v: pd.Series) -> int:
    return int(v.size)


def pandas_grouped_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED_AGG pandas UDF — the UDAF tier of the E21 surface: a
    Series->scalar Arrow-batched aggregate usable directly inside
    ``groupBy().agg(...)`` (and over unbounded windows), unlike
    ``applyInPandas`` which replaces the whole group frame.

    Scale shape: partial aggregation does NOT apply to a pandas UDAF (the
    engine must gather each group's full Series), so the group key
    shuffles raw rows — fine for medians (which need the full group
    anyway), wrong for sums (use built-ins); the docstring IS the
    guidance.  Median is chosen because pandas' sort-based median is
    order-independent, keeping the entry deterministic under any
    partitioning; DuckDB's interpolated median computes the identical
    (a+b)/2 arithmetic.
    """
    c = table(spark, sf_dir, "customer")
    # Spark forbids mixing a GROUPED_AGG pandas UDF with non-pandas
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT), so the row
    # count is a second pandas UDAF rather than F.count.
    return c.groupBy("c_mktsegment").agg(
        _median_udaf("c_acctbal").alias("median_acctbal"),
        _count_udaf("c_acctbal").alias("n_customers"),
    )


_oracle(
    "pandas_grouped_agg",
    """
    SELECT c_mktsegment,
           MEDIAN(c_acctbal) AS median_acctbal,
           COUNT(*) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)


def pandas_udaf_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The WINDOW form of the GROUPED_AGG pandas UDF: the same exact-
    median UDAF applied OVER an unbounded partition window, annotating
    every customer row with its segment's median (WindowInPandasExec — a
    genuinely different execution path from the groupBy form: per-window
    Arrow transfer, no aggregation node).  Deviation-from-median is the
    analytics idiom this enables in one pass."""
    from pyspark.sql import Window as W

    c = table(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment")
    med = _median_udaf("c_acctbal").over(w)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        med.alias("segment_median"),
        # raw IEEE difference — rounding a value that can tie at the
        # rounding scale diverges between engines (functions/numeric.py)
        (F.col("c_acctbal") - med).alias("dev_from_median"),
    )


_oracle(
    "pandas_udaf_window",
    """
    SELECT c_custkey, c_mktsegment, c_acctbal,
           MEDIAN(c_acctbal) OVER (PARTITION BY c_mktsegment)
               AS segment_median,
           c_acctbal - MEDIAN(c_acctbal)
                 OVER (PARTITION BY c_mktsegment) AS dev_from_median
    FROM customer
    """,
)
