"""Vectorized model-inference UDF: must equal a driver-side numpy
reference bit-for-bit (same numpy kernel on both sides)."""

from __future__ import annotations

import numpy as np

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import udfs


def test_inference_matches_numpy_reference(spark, sf_dir):
    got = {
        r["vec_id"]: r["model_score"]
        for r in udfs.model_scores_raw(spark, sf_dir).collect()
    }
    dim = 64
    w = np.array([((j * 37) % 19 - 9) / 10.0 for j in range(dim)])
    ref_rows = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    # BLAS gemm accumulation depends on the batch shape (Arrow batch sizes
    # differ from this single driver-side matmul), so bitwise equality is
    # not achievable — which is precisely why the raw-score frame carries
    # no exact oracle.  1e-12 relative tolerance pins correctness without
    # chasing blocking-dependent ULPs.
    mat = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in ref_rows]
    )
    expected = mat @ w
    for r, ex in zip(ref_rows, expected):
        assert abs(got[r["vec_id"]] - ex) <= 1e-12 * max(abs(ex), 1.0), r["vec_id"]


def test_serving_path_is_one_inference_no_gate_columns(spark, sf_dir):
    """model_scores_raw is the serving path: exactly (vec_id, label,
    model_score) — no probe inferences, no embedding copy (r10 review)."""
    assert udfs.model_scores_raw(spark, sf_dir).columns == [
        "vec_id", "label", "model_score",
    ]


def test_inference_invariant_gate_all_true(spark, sf_dir):
    """The registry entry's behavioral booleans must all hold on a real
    corpus — this is what the driver hash-checks against the all-true
    oracle (r9 verdict task 5)."""
    rows = udfs.model_inference_scores(spark, sf_dir).collect()
    n = table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n  # row-count identity, one row per embedding
    for r in rows:
        assert r.matches_exact_linear, r.vec_id
        assert r.f0_direction_ok, r.vec_id
        assert r.f1_direction_ok, r.vec_id


def test_inference_gate_scale_aware_tolerance(spark, tmp_path):
    """The exact-linear tolerance must scale with input magnitude: on
    embeddings around 1e6 the numpy-vs-fold ULP error exceeds a fixed
    1e-9 absolute tolerance (r10 review), so the gate must still pass."""
    dim = 64
    rows = [
        (int(i), [float((i * 7 + j) % 13 - 6) * 1e6 for j in range(dim)], "x")
        for i in range(40)
    ]
    d = str(tmp_path / "bigscale")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).write.parquet(f"{d}/embeddings.parquet")
    out = udfs.model_inference_scores(spark, d).collect()
    assert len(out) == 40
    for r in out:
        assert r.matches_exact_linear, r.vec_id
        assert r.f0_direction_ok, r.vec_id
        assert r.f1_direction_ok, r.vec_id


def test_inference_invariant_gate_catches_wrong_model(spark, sf_dir, monkeypatch):
    """The gate must FAIL when the model is wrong — otherwise the
    all-true oracle would be vacuous.  Build the scorer from a perturbed
    weight vector and check the gate booleans flip against the REAL
    weights."""
    import pyspark.sql.functions as F

    real = udfs._inference_weights

    def wrong():
        w = real()
        w[0] = w[0] + 0.5  # wrong slope along the pinned feature 0
        return w

    monkeypatch.setattr(udfs, "_inference_weights", wrong)
    wrong_score = udfs._score_udf()
    monkeypatch.setattr(udfs, "_inference_weights", real)

    e = table(spark, sf_dir, "embeddings")
    v = F.col("embedding").cast("array<double>")
    scored = e.select(
        v.alias("v"),
        wrong_score(v).alias("s"),
        wrong_score(udfs._bump_feature(v, 0)).alias("s_f0"),
    )
    w_arr = F.array(*[F.lit(wj) for wj in real()])
    terms = F.zip_with(F.col("v"), w_arr, lambda a, b: a * b)
    fold = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    l1 = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + F.abs(x))
    tol = F.lit(udfs.INFERENCE_TOL) * (F.lit(1.0) + l1)
    bad = scored.select(
        (F.abs(F.col("s") - fold) <= tol).alias("matches_exact_linear"),
        (F.abs((F.col("s_f0") - F.col("s")) - F.lit(real()[0])) <= tol)
        .alias("f0_direction_ok"),
    ).collect()
    # the direction probe's error is the constant 0.5 — every row flips;
    # matches_exact_linear's error is 0.5*|x_0|, so assert the corpus-level
    # flip (a single row with x_0 ~ 0 could legitimately still match)
    assert bad and all(not r.f0_direction_ok for r in bad)
    assert any(not r.matches_exact_linear for r in bad)
