

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
