"""pyspark.ml tier: behavior pinned against the custom implementations."""

from __future__ import annotations

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import dedup, ml_feature


def test_tfidf_ml_shapes(spark, sf_dir):
    out = ml_feature.tfidf_ml_features(spark, sf_dir).collect()
    assert len(out) == table(spark, sf_dir, "documents").count()
    for r in out:
        assert r["buckets_within_bound"] is True
        assert r["weight_nonneg"] is True
        assert 1 <= r["n_distinct_tokens"] <= r["n_tokens"]


def test_minhash_ml_finds_custom_pipeline_pairs(spark, sf_dir):
    """Every high-confidence pair from the custom MinHash pipeline must be
    found by the ml MinHashLSH variant (both see exact Jaccard >= 0.6 after
    their respective candidate generation)."""
    custom = {
        (r["doc_a"], r["doc_b"])
        for r in dedup.minhash_lsh_pairs(
            table(spark, sf_dir, "documents"), threshold=0.8
        ).collect()
    }
    ml = {
        (r["doc_a"], r["doc_b"])
        for r in ml_feature.minhash_ml_pairs(spark, sf_dir, threshold=0.6).collect()
    }
    # ml candidate generation is probabilistic too; demand the
    # high-similarity core is recovered
    missing = custom - ml
    assert not missing, f"ml variant missed high-sim pairs: {missing}"


def test_tfidf_idf_formula_elementwise(spark):
    """The part of TF-IDF the SQL oracle can't reach (it needs bucket
    ids, which only the engine's murmur3 produces): on a tiny corpus,
    every tfidf value must equal tf * ln((N+1)/(df+1)) with df counted
    from the corpus's own tf vectors — an IDF regression that rescales
    weights (or a tf/tfidf column swap) fails here even though the
    registry oracle's invariants survive it."""
    import math

    from pyspark.ml import Pipeline
    from pyspark.ml.feature import IDF, HashingTF, Tokenizer
    from pyspark.ml.functions import vector_to_array

    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (0, "spark shuffles data across executors"),
            (1, "spark broadcasts small data"),
            (2, "executors spill data to disk"),
            (3, "broadcast joins avoid the shuffle"),
        ],
        "doc_id long, text string",
    )
    pipe = Pipeline(
        stages=[
            Tokenizer(inputCol="text", outputCol="tokens"),
            HashingTF(inputCol="tokens", outputCol="tf", numFeatures=1 << 10),
            IDF(inputCol="tf", outputCol="tfidf"),
        ]
    )
    out = (
        pipe.fit(docs)
        .transform(docs)
        .select(
            "doc_id",
            vector_to_array("tf").alias("tf"),
            vector_to_array("tfidf").alias("tfidf"),
        )
        .collect()
    )
    n_docs = len(out)
    n_feat = len(out[0]["tf"])
    df = [sum(1 for r in out if r["tf"][j] > 0) for j in range(n_feat)]
    checked = 0
    for r in out:
        for j in range(n_feat):
            expected = r["tf"][j] * math.log((n_docs + 1) / (df[j] + 1))
            assert abs(r["tfidf"][j] - expected) < 1e-12, (
                r["doc_id"], j, r["tfidf"][j], expected)
            if r["tf"][j] > 0:
                checked += 1
    assert checked >= 15  # the corpus genuinely exercised the formula


def test_tfidf_tokenizer_parity_on_messy_whitespace(spark, sf_dir, tmp_path):
    """The oracle's literal-space string_split and Java Tokenizer's
    \\s-split agree only on whitespace-normalized text — pin the
    normalization by running the operator over a corpus with tabs,
    newlines, runs of spaces, trailing blanks, and an all-whitespace doc,
    and recomputing the oracle's expressions in DuckDB."""
    import duckdb

    rows = [
        (0, "alpha\tbeta  gamma "),
        (1, "  leading and trailing  "),
        (2, "line\nbreaks\nhere"),
        (3, "   "),
        (4, "plain single spaced"),
    ]
    d = str(tmp_path / "messy")
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        f"{d}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_distinct_tokens"], r["tf_total"])
        for r in ml_feature.tfidf_ml_features(spark, d).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{d}/documents.parquet/*.parquet'"
    )
    from airflow_postgres_to_s3_pipeline_spark.registry import ORACLES

    want = {
        r[0]: (r[1], r[2], r[3])
        for r in con.sql(ORACLES["tfidf_ml_features"]).fetchall()
    }
    assert got == want
    assert got[3] == (1, 1, 1)  # all-whitespace doc: the single empty token
