"""Corpus-curation operators: mixture sampling, contamination detection,
sequence packing — behavior on planted inputs plus rate sanity at sf."""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import curation


def test_mix_sample_rates_track_targets(spark, sf_dir):
    """Sampled/total per language must track the configured rate (binomial
    tolerance on small counts; 'en' rate 1.0 must be exact)."""
    totals = {
        r["lang"]: r["n"]
        for r in table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    sampled = {
        r["lang"]: r["n_sampled"]
        for r in curation.corpus_mix_sample(spark, sf_dir).collect()
    }
    assert sampled["en"] == totals["en"]
    for lang, thr in curation.MIX_WEIGHTS.items():
        if thr == "g":
            continue
        rate = int(thr, 16) / 65536.0
        n, k = totals[lang], sampled.get(lang, 0)
        sd = max((n * rate * (1 - rate)) ** 0.5, 1.0)
        assert abs(k - n * rate) <= 4 * sd, (lang, k, n, rate)


def test_mix_sample_is_deterministic(spark, sf_dir):
    a = sorted(map(tuple, curation.corpus_mix_sample(spark, sf_dir).collect()))
    b = sorted(map(tuple, curation.corpus_mix_sample(spark, sf_dir).collect()))
    assert a == b


def _write_docs(spark, tmp_path, rows):
    out = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(out + "/documents.parquet")
    return out


def test_contamination_detects_planted_overlap(spark, tmp_path):
    """A training doc sharing a 5-gram with an eval doc is flagged; one
    with no 5-gram overlap is not.  doc_id 40 hashes into the eval split
    (md5('40-eval') starts with '0'); 1 and 2 do not."""
    import hashlib

    assert hashlib.md5(b"40-eval").hexdigest().startswith("0")
    eval_text = "alpha beta gamma delta epsilon zeta"
    rows = [
        (40, eval_text, "en", "src_eval", len(eval_text)),
        (1, "alpha beta gamma delta epsilon other", "en", "src_a", 36),
        (2, "totally different words with no shared gram", "en", "src_b", 44),
    ]
    got = {
        r["source"]: (r["n_train_docs"], r["n_contaminated"])
        for r in curation.contamination_check(
            spark, _write_docs(spark, tmp_path, rows)
        ).collect()
    }
    assert got == {"src_a": (1, 1), "src_b": (1, 0)}


def test_contamination_short_doc_yields_no_grams(spark, tmp_path):
    """<5-word docs must produce zero 5-grams (sequence(1,0) guard), so a
    4-word training doc can never be contaminated."""
    rows = [
        (40, "alpha beta gamma delta epsilon", "en", "s_eval", 30),
        (1, "alpha beta gamma delta", "en", "s_short", 22),
    ]
    got = {
        r["source"]: r["n_contaminated"]
        for r in curation.contamination_check(
            spark, _write_docs(spark, tmp_path, rows)
        ).collect()
    }
    assert got == {"s_short": 0}


def test_sequence_packing_invariants(spark, sf_dir):
    """Bins partition each language's docs exactly once; every bin except a
    language's last holds >= budget tokens from its start offset (the
    stream cut property); totals are preserved."""
    packed = curation.sequence_packing(spark, sf_dir).collect()
    toks = (
        table(spark, sf_dir, "documents")
        .select(
            "lang",
            F.size(
                F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
            ).alias("n"),
        )
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("n").alias("tokens"))
        .collect()
    )
    by_lang = {}
    for r in packed:
        by_lang.setdefault(r["lang"], []).append(r)
    for t in toks:
        bins = sorted(by_lang[t["lang"]], key=lambda r: r["bin_id"])
        assert sum(r["n_docs"] for r in bins) == t["n_docs"]
        assert sum(r["total_tokens"] for r in bins) == t["tokens"]
        # contiguous bin ids from 0
        assert [r["bin_id"] for r in bins] == list(range(len(bins)))


def test_bpe_learns_expected_merges(spark):
    """Genuine BPE training on a planted frequency table: most-frequent
    pair first, merged symbols compose, training stops when no pairs
    remain."""
    wf = spark.createDataFrame(
        [("ab", 10), ("abc", 5)], ["word", "freq"]
    )
    segs, merges = curation._bpe_learn(wf)
    # pair (a,b) has weight 15, (b,c) only 5; after the first merge the
    # only remaining pair is (ab, c)
    assert merges == [("a", "b"), ("ab", "c")]
    got = {r["word"]: r["seg"] for r in segs.collect()}
    assert got == {"ab": " ab ", "abc": " abc "}


def test_bpe_tie_break_is_lexicographic(spark):
    """Equal-count pairs must merge the lexicographically smallest (pa,
    pb) — the determinism rule the DuckDB oracle mirrors."""
    wf = spark.createDataFrame([("ba", 3), ("ab", 3)], ["word", "freq"])
    _, merges = curation._bpe_learn(wf)
    assert merges[0] == ("a", "b")


def test_bpe_single_scan_merge_on_runs(spark):
    """The documented left-to-right single-scan semantics: one (a,a)
    merge pass over 'aaaa' yields [aa, a, a] (scan resumes after the
    replaced region), then later merges continue from there — identical
    in Spark and DuckDB replace()."""
    wf = spark.createDataFrame([("aaaa", 1)], ["word", "freq"])
    segs, merges = curation._bpe_learn(wf)
    assert merges[0] == ("a", "a")
    # training continues to a single symbol eventually
    final = segs.collect()[0]["seg"]
    assert final == " aaaa "


def test_bpe_doc_tokens_end_to_end(spark):
    """Per-doc counts from corpus-trained merges; empty docs kept at
    0/0."""
    d = spark.createDataFrame(
        [("en", 0, "ab ab abc"), ("en", 1, "")],
        ["lang", "doc_id", "text"],
    )
    got = {
        r["doc_id"]: (r["n_words"], r["bpe_tokens"])
        for r in curation._doc_bpe_tokens(d).collect()
    }
    # 'ab' and 'abc' both collapse to a single learned token
    assert got[0] == (3, 3)
    assert got[1] == (0, 0)


def test_sequence_packing_bpe_matches_python_recompute(spark, sf_dir):
    """Bin assignment at the token budget is exactly floor(prefix-sum /
    PACK_BUDGET) of the per-doc BPE counts, recomputed independently in
    Python from the per-doc frame."""
    d = table(spark, sf_dir, "documents")
    per_doc = curation._doc_bpe_tokens(d).collect()
    expected = {}
    by_lang = {}
    for r in sorted(per_doc, key=lambda r: (r["lang"], r["doc_id"])):
        off = by_lang.get(r["lang"], 0)
        key = (r["lang"], off // curation.PACK_BUDGET)
        n, tot = expected.get(key, (0, 0))
        expected[key] = (n + 1, tot + r["bpe_tokens"])
        by_lang[r["lang"]] = off + r["bpe_tokens"]
    packed = {
        (r["lang"], r["bin_id"]): (r["n_docs"], r["total_tokens"])
        for r in curation.sequence_packing_bpe(spark, sf_dir).collect()
    }
    assert packed == expected


def test_weighted_sample_sus_invariants(spark, sf_dir):
    """SUS draws exactly SUS_SAMPLES pointers, each doc at most
    ceil(w*n/W)+ish copies; the full Python recompute over the sorted
    cumulative line must match the distributed two-phase prefix-sum
    selection exactly."""
    import hashlib

    rows = (
        table(spark, sf_dir, "documents")
        .select("doc_id", F.col("n_chars").cast("long").alias("w"))
        .collect()
    )
    docs = sorted((r["doc_id"], r["w"]) for r in rows)
    W = sum(w for _, w in docs)
    n = curation.SUS_SAMPLES
    off = int(hashlib.md5(b"sus-offset-v1").hexdigest()[:15], 16) % W
    expected = {}
    c = 0
    for doc_id, w in docs:
        lo, hi = c, c + w
        hits = (n * hi - off + W - 1) // W - (n * lo - off + W - 1) // W
        if hits >= 1:
            expected[doc_id] = hits
        c = hi
    got = {
        r["doc_id"]: r["n_copies"]
        for r in curation.weighted_sample_sus(spark, sf_dir).collect()
    }
    assert got == expected
    assert sum(got.values()) == n


def test_weighted_sample_sus_multiplicity(spark, tmp_path):
    """A document heavier than the pointer stride W/n must be drawn
    multiple times (with-multiplicity SUS semantics)."""
    rows = [(i, "x", "en", "src0", 1) for i in range(100)]
    rows.append((100, "y", "en", "src0", 1000))  # ~91% of total weight
    out = _write_docs(spark, tmp_path, rows)
    got = {
        r["doc_id"]: r["n_copies"]
        for r in curation.weighted_sample_sus(spark, out).collect()
    }
    n = curation.SUS_SAMPLES
    assert sum(got.values()) == n
    # the heavy doc owns 1000/1100 of the line -> floor/ceil of n*10/11
    assert got[100] in (n * 1000 // 1100, n * 1000 // 1100 + 1)


def test_sequence_packing_ffd_matches_python_recompute(spark, sf_dir):
    """Bin layout must equal an exact FFD recompute, no bin may exceed
    the budget, and (since the contiguous tier splits documents) the FFD
    bin count per lang is >= the contiguous optimum ceil(total/budget)."""
    import math

    docs = (
        table(spark, sf_dir, "documents")
        .select(
            "lang", "doc_id",
            F.least(
                F.size(F.filter(F.split("text", " "),
                                lambda t: F.length(t) > 0)),
                F.lit(curation.PACK_BUDGET),
            ).alias("n_tokens"),
        )
        .collect()
    )
    by_lang = {}
    for r in docs:
        by_lang.setdefault(r["lang"], []).append((r["n_tokens"], r["doc_id"]))
    expected = {}
    for lang, items in by_lang.items():
        items.sort(key=lambda t: (-t[0], t[1]))
        remaining, nd, tot = [], [], []
        for tok, _ in items:
            for i, rcap in enumerate(remaining):
                if rcap >= tok:
                    remaining[i] -= tok
                    nd[i] += 1
                    tot[i] += tok
                    break
            else:
                remaining.append(curation.PACK_BUDGET - tok)
                nd.append(1)
                tot.append(tok)
        for b in range(len(tot)):
            expected[(lang, b)] = (nd[b], tot[b])
    got = {
        (r["lang"], r["bin_id"]): (r["n_docs"], r["total_tokens"])
        for r in curation.sequence_packing_ffd(spark, sf_dir).collect()
    }
    assert got == expected
    assert all(t <= curation.PACK_BUDGET for _, t in got.values())
    for lang, items in by_lang.items():
        n_bins = 1 + max(b for (l, b) in got if l == lang)
        opt = math.ceil(sum(t for t, _ in items) / curation.PACK_BUDGET)
        assert n_bins >= opt
