"""pyspark.ml.feature tier (SURVEY.md §2B E25/E27 alternative path).

The custom compositions in operators/dedup.py and operators/text.py are the
primary implementations (oracle-checkable, shuffle-transparent); these
variants exercise the `pyspark.ml` Pipeline API for the same semantics —
the path a team already standardized on MLlib would use.  Both are
rows-only checks (hashing-trick feature spaces are engine-internal), with
behavior pinned against the custom implementations in
tests/test_ml_feature.py.

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
    """TF-IDF via the ml Pipeline (Tokenizer -> HashingTF -> IDF): returns
    per-document top feature weight + vocabulary pressure stats (rows-only:
    the hashed feature space has no SQL mirror)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer

    d = table(spark, sf_dir, "documents")
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="tokens"),
            HashingTF(inputCol="tokens", outputCol="tf", numFeatures=1 << 14),
            IDF(inputCol="tf", outputCol="tfidf"),
        ]
    )
    out = pipe.fit(d).transform(d)
    # project vector internals to plain columns so the result is comparable
    from pyspark.ml.functions import vector_to_array

    arr = vector_to_array("tfidf")
    return out.select(
        "doc_id",
        F.array_max(arr).alias("max_weight"),
        F.size(F.filter(arr, lambda x: x > 0)).alias("n_active_features"),
    )


def minhash_ml_pairs(spark: SparkSession, sf_dir: str,
                     threshold: float = 0.6) -> DataFrame:
    """Near-dup candidate pairs via ml MinHashLSH.approxSimilarityJoin over
    hashed shingle vectors (rows-only; equivalence with the custom MinHash
    pipeline is pinned in tests)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from airflow_postgres_to_s3_pipeline_spark.operators.dedup import (
        shingle_arrays,
    )

    d = table(spark, sf_dir, "documents")
    sh = shingle_arrays(d, "text", "doc_id", k=3)
    tf = HashingTF(
        inputCol="shingles", outputCol="features", numFeatures=1 << 16, binary=True
    )
    feats = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=8)
    model = lsh.fit(feats)
    pairs = model.approxSimilarityJoin(
        feats, feats, 1.0 - threshold, distCol="jaccard_dist"
    )
    return (
        pairs.select(
            F.col("datasetA.doc_id").alias("doc_a"),
            F.col("datasetB.doc_id").alias("doc_b"),
            F.round(1.0 - F.col("jaccard_dist"), 3).alias("jaccard"),
        )
        .filter(F.col("doc_a") < F.col("doc_b"))
    )
