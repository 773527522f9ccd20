"""Global plan lint: every registered query's physical plan must be free of
accidental cartesian products and unpartitioned Window sorts — the two
plan shapes that cannot survive a 100x scale-up. Intentional exceptions
are explicit and justified."""

from __future__ import annotations

import pytest

from airflow_postgres_to_s3_pipeline_spark import registry
from airflow_postgres_to_s3_pipeline_spark.plans import (
    explain_str,
    unpartitioned_windows,
)

# Queries allowed to contain a non-equi / product join, with why:
# - embedding_near_dup: the intentionally-exact all-pairs baseline; the
#   sub-quadratic path is embedding_lsh_near_dup.
# - scalar_subquery_threshold / price_histogram / knn_bruteforce / knn_ivf /
#   kmeans_embeddings: broadcast of a metadata-sized side (1-row aggregate,
#   query set, centroids) — BroadcastNestedLoopJoin over a tiny build side
#   is O(n), not O(n^2).
# - embedding_lsh_near_dup: broadcasts the 1-row hyperplane-matrix frame
#   onto the corpus scan (engine-side plane generation); candidate pairing
#   itself is a banded equi-join.
# - hll_sketch_users: broadcasts the 1-row global exact-distinct aggregate
#   (scalar-subquery shape) onto the 1-row global-estimate aggregate for
#   the engine-side bound check.
# - knn_gemm: crossJoin of the bounded query set with a broadcast
#   range(n_shards) — engine-side replication of queries x shards rows so
#   every cogroup shard sees the full query set; the corpus side never
#   participates in the product.
# - semantic_dedup: same broadcast-argmin assignment as kmeans/knn_ivf —
#   the k-row centroid frame broadcasts onto the corpus scan; the pair
#   stage is a cluster-keyed cogroup, not a product.
# - inactive_high_value_customers: broadcasts the 1-row average-balance
#   aggregate (scalar-subquery shape, same as scalar_subquery_threshold).
# - ngram_lm_score: broadcasts the 1-row (total-tokens, vocab-size)
#   aggregate onto the vocab frame for the smoothed log-prob.
# - bm25_scoring: broadcasts the 1-row avgdl collection statistic.
# - knn_pq: broadcasts the 1-row packed codebook (32 KB) onto the corpus
#   scan for encoding, and the bounded query set onto the code stream for
#   ADC scoring — both build sides are metadata-sized.
ALLOWED_PRODUCT = {
    "vocab_growth_curve",  # broadcasts the 1-row MAX(doc_id) aggregate
    # onto the documents scan for decile bucketing — scalar collection
    # statistic, the scalar_subquery_threshold shape
    "knn_pq",
    "knn_pq_fold",
    "knn_ivfpq",  # same metadata-sized broadcasts (codebook, centroids,
    # query set); candidate pairing is the centroid_id equi-join
    "ngram_lm_score",
    "bm25_scoring",
    "knn_gemm",
    "semantic_dedup",
    "inactive_high_value_customers",
    "embedding_near_dup",
    "scalar_subquery_threshold",
    "price_histogram",
    "heavy_hitters_terms",
    "knn_bruteforce",
    "knn_ivf",
    "knn_ivf_fold",  # same deliberate queries x centroid-cells probe product
    "kmeans_embeddings",
    "embedding_lsh_near_dup",
    "hll_sketch_users",
    "weighted_sample_sus",  # broadcasts the 1-row (total-weight, offset)
    # frame onto the cumulative line — scalar collection statistic
    "embedding_incremental_dedup",  # same 1-row plane-matrix broadcast as
    # embedding_lsh_near_dup; candidate pairing is the banded equi-join
    "token_pmi_top_pairs",  # broadcasts the 1-row (T tokens, B bigrams)
    # totals — same scalar-statistic shape as ngram_lm_score
    "contrastive_triplets",  # rides embedding_lsh_near_dup's plane
    # broadcast + a 1-row n_vecs broadcast; negatives are row-local draws
    "hybrid_search_rrf",  # inherits bm25_scoring's 1-row avgdl broadcast;
    # dense scoring is a bucket equi-join, fusion joins two 20-row frames
    "dsir_importance_sample",  # broadcasts the 1-row (target-total,
    # raw-total) token-count frame onto the 256-bucket ratio table —
    # scalar collection statistic, same shape as ngram_lm_score
    "temperature_mix_allocation",  # broadcasts the 1-row sum-of-weights
    # aggregate onto the per-group frame for budget normalization
    "knn_ivfpq_refine",  # knn_ivfpq's whitelisted metadata broadcasts
    # plus the O(queries x depth) candidate-slate broadcast; the refine
    # fetch itself is a broadcast EQUI-join on vec_id
    "rerank_cross_encoder",  # hybrid_search_rrf's whitelisted 1-row
    # avgdl broadcast; the slate fetch is a broadcast equi-join on doc_id
    "knn_recall_eval",  # the exact-L2 truth side is the deliberate
    # knn_bruteforce-shaped broadcast of the bounded query set, plus the
    # two tiers' whitelisted metadata broadcasts
    "knn_probe_sweep",  # same exact-L2 truth shape + knn_ivfpq's
    # whitelisted metadata broadcasts, once per probed config
    "embedding_lsh_recall_eval",  # composes embedding_near_dup (the
    # whitelisted exact all-pairs baseline, here as eval ground truth)
    # with embedding_lsh_near_dup's whitelisted plane broadcast
    "key_skew_profile",  # broadcasts the 1-row top-key frame onto the
    # 1-row stats aggregate — scalar collection statistic, the
    # hll_sketch_users shape
    "lsh_recall_eval",  # r10 eval-sample cap: broadcasts the 1-row
    # corpus-count frame onto the documents scan so the sampling stride
    # is derived inside the plan — scalar collection statistic, the
    # weighted_sample_sus shape; candidate pairing stays the banded
    # equi-join and the truth side the shingle equi-join
    "lsh_band_sweep",  # same 1-row count broadcast via the shared
    # _eval_doc_sample source
}

# Queries allowed to plan an unpartitioned Window (the `WindowExec: No
# Partition Defined` single-task sort) — legal ONLY over a provably
# bounded frame, never over a corpus-sized one (r11 verdict task 3).
# Each whitelisted name states its bound:
# - quality_retention_curve: cumulative sums over the quality-BUCKET
#   frame (text.py) — <=100 rows regardless of corpus size.
# - hybrid_search_rrf: row_number over the two per-query fusion slates
#   (text.py ranked()) — each capped at the retrieved-list length
#   (top-k per retriever), not corpus-sized.
# - rerank_cross_encoder: inherits hybrid_search_rrf's slate ranks plus
#   one more row_number over the same bounded rerank slate (text.py).
# - weighted_sample_sus: cumulative weight offsets over the 256-bucket
#   frame (curation.py) — fixed bucket count.
# - approx_topk_terms: row_number over the k-row sketch output
#   (sketches.py) — k is the operator's parameter, not the corpus.
# - vocab_growth_curve: cumulative sums over the decile frame
#   (text.py) — <= VOCAB_BUCKETS (10) rows regardless of corpus size.
ALLOWED_GLOBAL_WINDOW = {
    "vocab_growth_curve",
    "quality_retention_curve",
    "hybrid_search_rrf",
    "rerank_cross_encoder",
    "weighted_sample_sus",
    "approx_topk_terms",
}

# Streaming queries execute eagerly on build (memory-sink materialization);
# their batch result plan is a trivial LocalTableScan, so linting them checks
# nothing — skip instead of paying ~3s each.
SKIP = {name for name in registry.QUERIES if name.startswith("streaming_")}


@pytest.mark.parametrize(
    "name", [n for n in sorted(registry.QUERIES) if n not in SKIP]
)
def test_no_accidental_cartesian(spark, sf_dir, name):
    """One pass, two scale-fatal shapes: cartesian/nested-loop joins and
    unpartitioned Window sorts (both whitelisted only with a stated
    bound).  Checked in one parametrized sweep so the second lint does
    not pay a second full registry plan build."""
    df = registry.QUERIES[name](spark, sf_dir)
    plan = explain_str(df, "simple")
    if name not in ALLOWED_GLOBAL_WINDOW:
        hits = unpartitioned_windows(df)
        assert not hits, (
            f"{name} plans {len(hits)} unpartitioned Window node(s) — a "
            "single-task sort of the whole input.  Partition it, or "
            "whitelist in ALLOWED_GLOBAL_WINDOW with the frame's bound:\n"
            + "\n".join(hits)
        )
    if name in ALLOWED_PRODUCT:
        return
    assert "CartesianProduct" not in plan, f"{name} plans a cartesian product"
    assert "BroadcastNestedLoopJoin" not in plan, (
        f"{name} plans a nested-loop join; broadcast-equi or banding expected"
    )


def test_unpartitioned_window_seen_inside_subquery(spark):
    """r12 ADVICE: the walk must descend into subquery plans — a
    corpus-sized global window hidden in a scalar subquery previously
    passed the lint because children() does not include expression
    subqueries."""
    spark.range(100).createOrReplaceTempView("_lint_probe")
    df = spark.sql(
        """
        SELECT id FROM _lint_probe
        WHERE id > (SELECT MAX(rn) - 5 FROM (
            SELECT row_number() OVER (ORDER BY id) AS rn FROM _lint_probe
        ))
        """
    )
    hits = unpartitioned_windows(df)
    assert hits, "global window inside a scalar subquery must be reported"
    # and a partitioned window in the same position stays clean
    clean = spark.sql(
        """
        SELECT id FROM _lint_probe
        WHERE id > (SELECT MAX(rn) - 5 FROM (
            SELECT row_number() OVER (PARTITION BY id % 7 ORDER BY id)
                   AS rn FROM _lint_probe
        ))
        """
    )
    assert not unpartitioned_windows(clean)
