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


def test_inference_invariant_gate_all_true(spark, sf_dir):
    """The registry entry's three behavioral booleans must all hold on a
    real corpus — this is what the driver hash-checks against the
    all-true oracle (r9 verdict task 5)."""
    rows = udfs.model_inference_scores(spark, sf_dir).collect()
    n = table(spark, sf_dir, "embeddings").count()
    assert len(rows) == n  # row-count identity, one row per embedding
    for r in rows:
        assert r.matches_exact_linear, r.vec_id
        assert r.within_l1_bound, r.vec_id
        assert r.f0_direction_ok, r.vec_id


def test_inference_invariant_gate_catches_wrong_model(spark, sf_dir, monkeypatch):
    """The gate must FAIL when the model is wrong — otherwise the
    all-true oracle would be vacuous.  Perturb one weight and check
    matches_exact_linear and f0_direction_ok flip to False."""
    real = udfs._inference_weights

    def wrong():
        w = real()
        w[0] = w[0] + 0.5  # wrong slope along the pinned feature
        return w

    # Only the UDF side uses the patched weights: the invariant fold in
    # model_inference_scores recomputes from _inference_weights too, so
    # patch JUST the raw scorer's view by wrapping model_scores_raw.
    import pyspark.sql.functions as F

    monkeypatch.setattr(udfs, "_inference_weights", wrong)
    scored_wrong = udfs.model_scores_raw(spark, sf_dir)
    monkeypatch.setattr(udfs, "_inference_weights", real)

    w_arr = F.array(*[F.lit(wj) for wj in real()])
    terms = F.zip_with(F.col("v"), w_arr, lambda a, b: a * b)
    fold = F.aggregate(terms, F.lit(0.0), lambda acc, x: acc + x)
    bad = scored_wrong.select(
        (F.abs(F.col("model_score") - fold) <= udfs.INFERENCE_TOL)
        .alias("matches_exact_linear"),
        (
            F.abs(
                (F.col("model_score_f0_plus1") - F.col("model_score"))
                - F.lit(real()[0])
            )
            <= udfs.INFERENCE_TOL
        ).alias("f0_direction_ok"),
    ).collect()
    # the direction probe's error is the constant 0.5 — every row flips;
    # matches_exact_linear's error is 0.5*|x_0|, so assert the corpus-level
    # flip (a single row with x_0 ~ 0 could legitimately still match)
    assert bad and all(not r.f0_direction_ok for r in bad)
    assert any(not r.matches_exact_linear for r in bad)
