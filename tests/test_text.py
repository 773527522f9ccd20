

def test_pmi_ranks_exclusive_collocation_over_common_words(spark, tmp_path):
    """A pair that only ever appears together must out-rank a pair of
    individually-frequent words that co-occur the same number of times."""
    from airflow_postgres_to_s3_pipeline_spark.operators import text as t

    # "zig zag" appears 5x and its words never appear elsewhere;
    # "the cat" appears 5x but both words are everywhere else too
    docs = ["zig zag the cat " + "the dog " * 5 + "cat nap " * 5] * 5
    rows = [(i, s, "en", "s", len(s)) for i, s in enumerate(docs)]
    out = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(out + "/documents.parquet")
    res = t.token_pmi_top_pairs(spark, out).collect()
    rank = {(r["a"], r["b"]): i for i, r in enumerate(res)}
    assert ("zig", "zag") in rank and ("the", "cat") in rank
    assert rank[("zig", "zag")] < rank[("the", "cat")]


def test_hybrid_rrf_fusion_arithmetic(spark, sf_dir):
    """rrf_micro must equal 1e6//(K+lex_rank) + 1e6//(K+dense_rank) with
    absent-list terms contributing zero, and a doc on BOTH lists must
    out-score a doc appearing on one list at the same rank."""
    from airflow_postgres_to_s3_pipeline_spark.operators import text as t

    rows = t.hybrid_search_rrf(spark, sf_dir).collect()
    assert rows
    for r in rows:
        want = 0
        if r["lex_rank"] is not None:
            want += 1_000_000 // (t.RRF_K + r["lex_rank"])
        if r["dense_rank"] is not None:
            want += 1_000_000 // (t.RRF_K + r["dense_rank"])
        assert r["rrf_micro"] == want
    both = [r for r in rows
            if r["lex_rank"] is not None and r["dense_rank"] is not None]
    assert both, "query terms should produce overlap between the lists"


def test_rerank_cross_encoder_permutes_slate(spark, sf_dir):
    """Rerank must keep exactly the hybrid slate's documents (no adds, no
    drops), assign a dense 1..N ce_rank in (ce_score desc, rrf_micro
    desc, doc_id) order, and bound the coverage component by the query
    term count."""
    from airflow_postgres_to_s3_pipeline_spark.operators import text as t

    fused = {
        r["doc_id"]: r["rrf_micro"]
        for r in t.hybrid_search_rrf(spark, sf_dir).collect()
    }
    rows = t.rerank_cross_encoder(spark, sf_dir).collect()
    assert {r["doc_id"] for r in rows} == set(fused)
    assert all(r["rrf_micro"] == fused[r["doc_id"]] for r in rows)
    assert sorted(r["ce_rank"] for r in rows) == list(range(1, len(rows) + 1))
    want_order = [
        r["doc_id"]
        for r in sorted(
            rows,
            key=lambda r: (-r["ce_score"], -r["rrf_micro"], r["doc_id"]),
        )
    ]
    got_order = [
        r["doc_id"] for r in sorted(rows, key=lambda r: r["ce_rank"])
    ]
    assert got_order == want_order
    for r in rows:
        cover = r["ce_score"] // t.RERANK_COVER_PTS
        assert 0 <= cover <= len(t.BM25_QUERY_TERMS)


def test_quality_retention_curve_is_monotone_and_totals(spark, sf_dir):
    """Retained counts must be non-increasing in the threshold, the lowest
    present threshold must retain the whole scored corpus, and one spot
    threshold must agree with a direct filter over doc_quality."""
    from pyspark.sql import functions as F

    from airflow_postgres_to_s3_pipeline_spark.operators import text as text_ops

    rows = sorted(
        text_ops.quality_retention_curve(spark, sf_dir).collect(),
        key=lambda r: r.threshold,
    )
    assert len(rows) >= 2
    for lo, hi in zip(rows, rows[1:]):
        assert lo.docs_retained >= hi.docs_retained
        assert lo.tokens_retained >= hi.tokens_retained
        assert lo.chars_retained >= hi.chars_retained
        assert lo.token_retention >= hi.token_retention

    q = text_ops.doc_quality(spark, sf_dir)
    totals = q.agg(
        F.count(F.lit(1)).alias("docs"), F.sum("n_tokens").alias("toks")
    ).collect()[0]
    # every document scores >= the lowest present threshold by construction
    assert rows[0].docs_retained == totals.docs
    assert rows[0].tokens_retained == totals.toks
    assert abs(rows[0].token_retention - 1.0) < 1e-12

    t = rows[len(rows) // 2].threshold
    # the bucket floor at the threshold boundary IS score >= t for grid
    # thresholds: floor(s*100) >= 100t  <=>  s >= t when 100t is integral
    direct = q.filter(
        F.least(
            F.floor(F.col("quality_score") * 100).cast("int"), F.lit(99)
        ) >= int(round(t * 100))
    ).count()
    assert rows[len(rows) // 2].docs_retained == direct
