"""Vectorized model-inference UDF: must equal a driver-side numpy
reference bit-for-bit (same numpy kernel on both sides)."""

from __future__ import annotations

import numpy as np

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import udfs


def test_inference_matches_numpy_reference(spark, sf_dir):
    got = {
        r["vec_id"]: r["model_score"]
        for r in udfs.model_inference_scores(spark, sf_dir).collect()
    }
    dim = 64
    w = np.array([((j * 37) % 19 - 9) / 10.0 for j in range(dim)])
    ref_rows = table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).collect()
    # BLAS gemm accumulation depends on the batch shape (Arrow batch sizes
    # differ from this single driver-side matmul), so bitwise equality is
    # not achievable — which is precisely why the operator is a rows-only
    # check.  1e-12 relative tolerance pins correctness without chasing
    # blocking-dependent ULPs.
    mat = np.stack(
        [np.asarray(r["embedding"], dtype=np.float64) for r in ref_rows]
    )
    expected = mat @ w
    for r, ex in zip(ref_rows, expected):
        assert abs(got[r["vec_id"]] - ex) <= 1e-12 * max(abs(ex), 1.0), r["vec_id"]
