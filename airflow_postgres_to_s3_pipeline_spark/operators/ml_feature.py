"""pyspark.ml.feature tier (SURVEY.md §2B E25/E27 alternative path).

The custom compositions in operators/dedup.py and operators/text.py are the
primary implementations (oracle-checkable, shuffle-transparent); these
variants exercise the `pyspark.ml` Pipeline API for the same semantics —
the path a team already standardized on MLlib would use.  Both carry FULL
DuckDB oracles despite the engine-internal hashed feature spaces:
minhash_ml_pairs verifies its candidates against raw shingle sets (so the
output is the exact SQL truth set), and tfidf_ml_features emits an
invariant frame the oracle recomputes from text; behavior is additionally
pinned against the custom implementations in tests/test_ml_feature.py.

Scale notes: HashingTF/IDF/MinHashLSH are all map-side transforms plus one
aggregate (IDF fit) or one banded join (approxSimilarityJoin) — the same
shuffle profile as the custom operators; `numFeatures`/`numHashTables`
trade accuracy for state exactly like n_hashes/bands in dedup.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table

ORACLES: dict[str, str] = {}


def tfidf_ml_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF via the ml Pipeline (Tokenizer -> HashingTF -> IDF),
    projected to an INVARIANT frame with an exact SQL mirror (upgraded
    from rows-only per the r8 verdict).  What is verified where — scoped
    honestly, because the murmur3 bucket identity has no SQL form:

    - membership is exact: one row per document, hash-checked, so
      missing/duplicated docs — the realistic pipeline failure — fail;
    - n_tokens / n_distinct_tokens recompute the Tokenizer semantics.
      Tokenizer is Java ``toLowerCase.split("\\s")`` (any whitespace,
      trailing empties dropped) while DuckDB's string_split is
      literal-space and keeps trailing empties, so BOTH sides tokenize a
      whitespace-normalized column (collapse runs -> single space, trim)
      on which the two rules provably agree — including the empty-text
      edge, where both yield the single empty token;
    - tf_total pins HashingTF's exact counting end-to-end: the tf
      vector's values must sum to the token count — every token counted
      exactly once across buckets, so a dropped/double-counted token or
      a tf/tf-idf column swap fails the hash gate;
    - buckets_within_bound pins the hashing-trick pigeonhole (nonzero
      buckets in [1, n_distinct]); weight_nonneg pins IDF's sign.  The
      IDF formula itself (tfidf == tf * ln((N+1)/(df+1)) elementwise,
      df from the corpus) is pinned by tests/test_ml_feature.py — that
      part needs the bucket ids, which only the engine can produce.
    """
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    d = table(spark, sf_dir, "documents").withColumn(
        "text_ws", F.trim(F.regexp_replace("text", r"\s+", " "))
    )
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text_ws", outputCol="tokens"),
            HashingTF(inputCol="tokens", outputCol="tf", numFeatures=1 << 14),
            IDF(inputCol="tf", outputCol="tfidf"),
        ]
    )
    out = pipe.fit(d).transform(d)
    # project vector internals to plain columns so the result is comparable
    from pyspark.ml.functions import vector_to_array

    tf_arr = vector_to_array("tf")
    tfidf_arr = vector_to_array("tfidf")
    # Fold only the NONZERO buckets (ADVICE r9): tf values are counts, so
    # summing the zero-filtered projection equals summing the dense vector
    # — but the interpreted HOF then runs ~n_distinct_tokens lambda steps
    # per doc instead of the full 16384-element feature width.
    tf_nonzero = F.filter(tf_arr, lambda x: x > 0)
    n_buckets = F.size(tf_nonzero)
    n_distinct = F.size(F.array_distinct("tokens"))
    tf_total = F.aggregate(tf_nonzero, F.lit(0.0), lambda a, x: a + x)
    return out.select(
        "doc_id",
        F.size("tokens").alias("n_tokens"),
        n_distinct.alias("n_distinct_tokens"),
        tf_total.cast("long").alias("tf_total"),
        ((n_buckets >= 1) & (n_buckets <= n_distinct))
        .alias("buckets_within_bound"),
        # array_MIN, not max (r10 review): on a mostly-zero dense vector
        # max >= 0 is vacuously true, so a negative IDF weight could never
        # trip it; min == 0 when every weight is nonnegative and goes
        # negative with the first bad weight.  ArrayMin is a codegen'd
        # JVM builtin, not an interpreted HOF.
        (F.array_min(tfidf_arr) >= 0.0).alias("weight_nonneg"),
    )


ORACLES["tfidf_ml_features"] = r"""
    WITH t AS (
        SELECT doc_id,
               string_split(
                   lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), ' '
               ) AS toks
        FROM documents
    )
    SELECT doc_id,
           LEN(toks) AS n_tokens,
           LEN(list_distinct(toks)) AS n_distinct_tokens,
           CAST(LEN(toks) AS BIGINT) AS tf_total,
           true AS buckets_within_bound,
           true AS weight_nonneg
    FROM t
"""


def minhash_ml_pairs(spark: SparkSession, sf_dir: str,
                     threshold: float = 0.6) -> DataFrame:
    """Near-dup pairs via ml MinHashLSH.approxSimilarityJoin candidates +
    the repo's exact raw-shingle verify stage (dedup.verify_jaccard) — the
    standard loose-candidates / exact-verify pipeline, on the MLlib tier.

    FULL oracle (upgraded from rows-only per the r8 verdict): because the
    verify stage applies the shared exact-Jaccard rule (round 3, then
    threshold) over the RAW shingle sets, the emitted pairs are a subset
    of the SQL-computable exact truth set — and equal to it whenever the
    candidate stage misses no true pair.  The candidate stage runs at a
    deliberately LOOSER hashed-Jaccard threshold (0.8 x threshold) so the
    only miss mode is banding non-collision, which with a fixed LSH seed
    is a deterministic function of the corpus — checked equal to truth at
    sf0.001/0.01/0.1 before registration, so the driver's hash gate is
    stable, not probabilistic.  numHashTables is 24 (not MLlib's default
    5) to make that corpus-equality claim robust rather than lucky: a
    true pair at exactly J = threshold = 0.6 evades all tables with
    probability (1-J)^T — 0.066% at T=8 (one expected miss per ~1.5k
    truth pairs, a real risk at sf0.1's 256 pairs), 3e-10 at T=24.  At
    corpus scale the truth side is re-checked on a doc-hash sample
    exactly like lsh_recall_eval.
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from airflow_postgres_to_s3_pipeline_spark.operators.dedup import (
        shingle_arrays,
        spread_input,
        verify_jaccard,
    )

    # spread the single local file before shingling + HashingTF (see
    # dedup.spread_input: conditional — local-bench-only parallelism;
    # without it the whole MLlib feature pipeline ran in ONE scan task,
    # 22.1s -> 5.9s at sf0.1)
    d = spread_input(table(spark, sf_dir, "documents"))
    sh = shingle_arrays(d, "text", "doc_id", k=3)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 16, binary=True
    )
    feats = tf.transform(sh)
    lsh = MinHashLSH(
        inputCol="features", outputCol="hashes", numHashTables=24, seed=42
    )
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - 0.8 * threshold, distCol="jaccard_dist"
    )
    cand = pairs.select(
        F.col("datasetA.doc_id").alias("doc_a"),
        F.col("datasetB.doc_id").alias("doc_b"),
    ).filter(F.col("doc_a") < F.col("doc_b"))
    return verify_jaccard(cand, sh, threshold)


def _truth_pairs_oracle(threshold: float = 0.6) -> str:
    """Exact Jaccard truth pairs over raw word-3-shingles — parameterized
    on the SAME threshold the operator takes, so a re-registration at a
    different threshold cannot silently keep comparing against 0.6."""
    return f"""
    WITH w AS (
        SELECT doc_id, string_split(text, ' ') AS ws
        FROM documents
        WHERE LEN(string_split(text, ' ')) >= 3
    ), shl AS (
        SELECT doc_id,
               list_distinct(list_transform(
                   generate_series(1, LEN(ws) - 2),
                   i -> ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
               )) AS shingles
        FROM w
    ), sh AS (
        SELECT doc_id, UNNEST(shingles) AS shingle FROM shl
    ), inter AS (
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_inter
        FROM sh a JOIN sh b
          ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ), sizes AS (
        SELECT doc_id, LEN(shingles) AS set_size FROM shl
    )
    SELECT doc_a, doc_b,
           ROUND(n_inter / (za.set_size + zb.set_size - n_inter), 3)
               AS jaccard
    FROM inter
    JOIN sizes za ON za.doc_id = doc_a
    JOIN sizes zb ON zb.doc_id = doc_b
    WHERE ROUND(n_inter / (za.set_size + zb.set_size - n_inter), 3)
          >= {threshold}
"""


ORACLES["minhash_ml_pairs"] = _truth_pairs_oracle(threshold=0.6)
