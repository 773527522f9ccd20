

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


def _write_edge_docs(spark, tmp_path):
    """Planted edge corpus: empty text, whitespace-only, short doc, PII
    (email + long digit run), and a normal doc — the branches the shipped
    corpus never exercises (r9 review)."""
    rows = [
        (0, "", "en", "s", 0),
        (1, "   ", "en", "s", 3),
        (2, "tiny doc", "en", "s", 8),
        (3, "mail me at jane.doe@example.com or call 12345678 now",
         "en", "s", 52),
        (4, "the quick brown fox jumps over the lazy dog today", "en", "s",
         50),
    ]
    out = str(tmp_path / "edge")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(out + "/documents.parquet")
    return out


def _duck_on(out, sql):
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{out}/documents.parquet/*.parquet'"
    )
    return con.sql(sql).fetchall()


def test_doc_quality_empty_text_matches_oracle(spark, tmp_path):
    """Empty text made punct_ratio 0/0 THROW under Spark 4 ANSI mode (r9
    review) — try_divide now yields NULL, and the whole frame must still
    hash-match the DuckDB oracle, short-doc score branch included."""
    from airflow_postgres_to_s3_pipeline_spark.operators import text as t
    from airflow_postgres_to_s3_pipeline_spark.registry import ORACLES

    out = _write_edge_docs(spark, tmp_path)
    got = {r["doc_id"]: (r["punct_ratio"], r["quality_score"])
           for r in t.doc_quality(spark, out).collect()}
    assert got[0][0] is None        # empty text: NULL ratio, no crash
    assert got[0][1] == 0.0         # short-doc branch: score pinned to 0
    assert got[2][1] == 0.0         # n_tokens < 5 branch actually hit
    want = {r[0]: (r[5], r[7])
            for r in _duck_on(out, ORACLES["doc_quality"])}
    for k, (pr, sc) in got.items():
        opr, osc = want[k]
        assert (pr is None) == (opr is None) and (pr or 0) == (opr or 0), k
        assert sc == osc, k


def test_reading_level_whitespace_only_matches_oracle(spark, tmp_path):
    """Whitespace-only text made vowel_groups_per_word 0/0 THROW under
    ANSI (r9 review) — try_divide now mirrors the oracle's NULL."""
    from airflow_postgres_to_s3_pipeline_spark.operators import text as t
    from airflow_postgres_to_s3_pipeline_spark.registry import ORACLES

    out = _write_edge_docs(spark, tmp_path)
    got = {r["doc_id"]: (r["n_words"], r["vowel_groups_per_word"])
           for r in t.reading_level(spark, out).collect()}
    assert got[1] == (0, None)
    want = {r[0]: (r[2], r[5])
            for r in _duck_on(out, ORACLES["reading_level"])}
    for k, (nw, vg) in got.items():
        assert nw == want[k][0], k
        assert (vg is None) == (want[k][1] is None), k
        if vg is not None:
            assert abs(vg - want[k][1]) < 1e-12, k


def test_pii_scrub_redacts_and_matches_oracle(spark, tmp_path):
    """The scrub's REDACTION path (never exercised by the shipped corpus:
    zero emails / digit runs at every sf) against planted PII, with the
    Java-regex output compared cell-for-cell to DuckDB's RE2 output."""
    from airflow_postgres_to_s3_pipeline_spark.operators import text as t
    from airflow_postgres_to_s3_pipeline_spark.registry import ORACLES

    out = _write_edge_docs(spark, tmp_path)
    got = {r["doc_id"]: (r["scrubbed_text"], r["n_emails"],
                         r["n_long_numbers"])
           for r in t.pii_scrub(spark, out).collect()}
    assert got[3] == ("mail me at <EMAIL> or call <NUM> now", 1, 1)
    assert got[4][1] == 0 and got[4][2] == 0
    want = {r[0]: (r[1], r[2], r[3])
            for r in _duck_on(out, ORACLES["pii_scrub"])}
    assert got == want


def test_vocab_growth_curve_invariants(spark, sf_dir):
    """Monotone cumulative vocab; decile new_types sum to the global
    distinct-type count; cum_tokens ends at the corpus token total."""
    from airflow_postgres_to_s3_pipeline_spark.operators import text as t

    rows = sorted(
        t.vocab_growth_curve(spark, sf_dir).collect(),
        key=lambda r: r["bucket"],
    )
    assert [r["bucket"] for r in rows] == list(range(len(rows)))
    vocab = [r["vocab_size"] for r in rows]
    assert vocab == sorted(vocab)
    assert all(
        r["new_types"] <= r["distinct_in_bucket"] <= r["n_tokens"]
        for r in rows
    )
    from airflow_postgres_to_s3_pipeline_spark.catalog import table
    from pyspark.sql import functions as F

    toks = table(spark, sf_dir, "documents").select(
        F.explode(F.split("text", " ")).alias("tok")
    )
    assert rows[-1]["vocab_size"] == toks.distinct().count()
    assert rows[-1]["cum_tokens"] == toks.count()


def test_ngram_novelty_planted(spark, tmp_path):
    """First doc is 100% novel; a verbatim copy is 0% novel; a doc
    sharing half its grams scores in between with exact integer ppm."""
    from airflow_postgres_to_s3_pipeline_spark.operators import text as t

    a = "a b c d e f"           # 4 distinct trigrams, all first-seen
    c = "x y z a b c"           # trigrams: xyz, yza, zab, abc -> 3 novel, 1 seen
    spark.createDataFrame(
        [(0, a), (1, a), (2, c)], "doc_id long, text string"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: (
            r["n_distinct_grams"], r["n_novel_grams"], r["novelty_ppm"]
        )
        for r in t.ngram_novelty_score(spark, str(tmp_path)).collect()
    }
    assert rows[0] == (4, 4, 1_000_000)
    assert rows[1] == (4, 0, 0)
    assert rows[2] == (4, 3, 750_000)
