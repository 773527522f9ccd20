"""Training-corpus curation operators (LLM-data-pipeline tier, beyond
SURVEY.md §2: mixture sampling, benchmark-contamination detection, and
sequence packing over the ``documents`` table).

All three follow the engine's determinism discipline: membership and
ordering are pure functions of row content (md5 content hashes, explicit
ORDER BY keys), never RNG or partition order, so every entry carries a full
DuckDB oracle.

Scale notes (100 TB):
- corpus_mix_sample: the weights table is a broadcast dim; the corpus scan
  filters row-locally on a hash prefix — zero extra shuffles over the
  final stats aggregate.
- contamination_check: the eval side of the n-gram join is the deliberately
  small side (a held-out benchmark is millions of n-grams, not billions);
  train-side n-grams stream through a broadcast semi-join without
  shuffling the corpus.  If the eval set ever outgrows broadcast, the same
  plan degrades gracefully to a shuffle equi-join on the n-gram hash.
- sequence_packing: a running prefix-sum is inherently sequential per
  packing group; partitioning by lang keeps groups parallel and bounded.
  At 100 TB pack within (lang, shard) buckets instead of one global
  stream — same expression, one extra partition key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table

ORACLES: dict[str, str] = {}


def _oracle(name: str, sql: str):
    ORACLES[name] = sql


# Target mixture rates by language: threshold on the first 4 hex chars of a
# doc-content hash.  Lexicographic comparison of fixed-width lowercase hex
# equals numeric comparison, and 'g' sorts above every hex digit (rate 1.0).
MIX_WEIGHTS: dict[str, str] = {
    "en": "g",      # keep all
    "fr": "8000",   # ~1/2
    "de": "8000",   # ~1/2
    "es": "4000",   # ~1/4
    "zh": "4000",   # ~1/4
}


STRATA_K = 40


def stratified_sample_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-K-per-stratum sampling: keep precisely K documents per
    (lang, source) cell, chosen by deterministic md5 rank — the quota form
    of stratified sampling (per-domain caps, eval-set carve-outs), as
    opposed to ``corpus_mix_sample``'s proportional rates.

    Rank = row_number over (md5(doc_id), doc_id) inside the stratum: a pure
    function of the rows, so the SAME K docs are chosen on any engine or
    partitioning.  The rn <= K filter makes the ranking window a
    WindowGroupLimit (top-K pushdown): each map partition forwards at
    most K rows per stratum into the exchange, so the shuffle carries
    ~K x strata x map-partitions rows, not the corpus.  stratum_size
    comes from a SECOND scan with a map-side partial count (the shuffle
    is strata-sized) joined back by broadcast.  The tempting
    "one-shuffle" alternative — a whole-partition count(*) window on the
    same keys — was tried in r10 and reverted: counting every row from
    inside the window plan defeats WindowGroupLimit, so the ENTIRE corpus
    crosses the stratum exchange.  At 100 TB a second linear parquet scan
    (columnar, footer-pruned to 4 columns) plus a tiny broadcast join is
    orders cheaper than shuffling 100 TB.
    """
    d = table(spark, sf_dir, "documents")
    rank_key = F.md5(
        F.concat(F.col("doc_id").cast("string"), F.lit("-strat")).cast("binary")
    )
    w = Window.partitionBy("lang", "source").orderBy(rank_key, "doc_id")
    ranked = d.select(
        "lang", "source", "n_chars", F.row_number().over(w).alias("rn")
    )
    kept = ranked.filter(F.col("rn") <= STRATA_K)
    # strata-count-sized after the map-side partial agg — broadcast it
    totals = d.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("stratum_size")
    )
    return (
        kept.groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").alias("kept_chars"),
        )
        .join(F.broadcast(totals), ["lang", "source"])
    )


_oracle(
    "stratified_sample_k_per_group",
    f"""
    WITH ranked AS (
        SELECT lang, source, n_chars,
               row_number() OVER (
                   PARTITION BY lang, source
                   ORDER BY md5(CAST(doc_id AS VARCHAR) || '-strat'), doc_id
               ) AS rn
        FROM documents
    ), totals AS (
        SELECT lang, source, COUNT(*) AS stratum_size
        FROM documents GROUP BY lang, source
    )
    SELECT r.lang, r.source,
           COUNT(*) AS n_kept,
           CAST(SUM(n_chars) AS BIGINT) AS kept_chars,
           MIN(t.stratum_size) AS stratum_size
    FROM ranked r JOIN totals t USING (lang, source)
    WHERE r.rn <= {STRATA_K}
    GROUP BY r.lang, r.source
    """,
)


def corpus_mix_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted mixture sampling: down-sample each language to
    a target rate (the data-mixing step of a training-corpus build).

    Membership = substr(md5(doc_id || '-mix'), 1, 4) < per-lang threshold —
    a pure function of the row, reproducible on any engine/partitioning
    (same primitive as ``deterministic_sample``).  The weights live in a
    broadcast dimension frame, so re-weighting a 100 TB corpus is a scan +
    row-local filter.  Returns per-language sampled counts and volume.
    """
    d = table(spark, sf_dir, "documents")
    weights = spark.createDataFrame(
        list(MIX_WEIGHTS.items()), ["lang", "thr"]
    )
    key = F.concat(F.col("doc_id").cast("string"), F.lit("-mix"))
    sampled = (
        d.join(F.broadcast(weights), "lang")
        .filter(F.substring(F.md5(key.cast("binary")), 1, 4) < F.col("thr"))
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_sampled"),
        F.sum("n_chars").alias("sampled_chars"),
    )


_oracle(
    "corpus_mix_sample",
    """
    WITH w(lang, thr) AS (
        VALUES ('en', 'g'), ('fr', '8000'), ('de', '8000'),
               ('es', '4000'), ('zh', '4000')
    )
    SELECT d.lang, COUNT(*) AS n_sampled,
           CAST(SUM(d.n_chars) AS BIGINT) AS sampled_chars
    FROM documents d JOIN w USING (lang)
    WHERE substr(md5(CAST(d.doc_id AS VARCHAR) || '-mix'), 1, 4) < w.thr
    GROUP BY d.lang
    """,
)


NGRAM_N = 5


def _word_5grams(df: DataFrame) -> DataFrame:
    """Explode each document into its word 5-grams (row-local: tokenize +
    slice inside the scan stage; rows expand in place)."""
    words = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    n_starts = F.size(words) - (NGRAM_N - 1)
    # Guard: Spark's sequence(1, 0) walks DESCENDING ([1, 0]) instead of
    # returning empty — a <N_GRAM-word doc must yield zero grams.
    starts = F.when(n_starts > 0, F.sequence(F.lit(1), n_starts)).otherwise(
        F.array().cast("array<int>")
    )
    grams = F.transform(
        starts, lambda i: F.concat_ws(" ", F.slice(words, i, NGRAM_N))
    )
    return df.select(
        "doc_id", "source", "is_eval", F.explode(grams).alias("g")
    )


def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination scan: which training documents share any
    word 5-gram with the held-out eval split?

    The eval split is the deterministic ~1/16 hash slice (doc_id-based, the
    same train/eval discipline a real corpus uses).  Eval n-grams dedupe to
    a small frame and broadcast; training n-grams stream through a
    broadcast LEFT SEMI join — the corpus is never shuffled, and each
    contaminated doc is counted once.  Returns per-source totals: documents
    scanned, documents contaminated.
    """
    d = table(spark, sf_dir, "documents").withColumn(
        "is_eval",
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit("-eval")).cast(
                "binary"
            )
        ).like("0%"),
    )
    grams = _word_5grams(d)
    eval_grams = grams.filter(F.col("is_eval")).select("g").distinct()
    contaminated = (
        grams.filter(~F.col("is_eval"))
        .join(F.broadcast(eval_grams), "g", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contaminated", F.lit(True))
    )
    train = d.filter(~F.col("is_eval"))
    return (
        train.join(contaminated, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train_docs"),
            F.count("is_contaminated").alias("n_contaminated"),
        )
    )


_oracle(
    "contamination_check",
    """
    WITH toks AS (
        SELECT doc_id, source,
               list_filter(string_split(text, ' '), t -> length(t) > 0) AS w,
               md5(CAST(doc_id AS VARCHAR) || '-eval') LIKE '0%' AS is_eval
        FROM documents
    ), grams AS (
        SELECT doc_id, source, is_eval,
               array_to_string(w[i:i+4], ' ') AS g
        FROM toks, UNNEST(generate_series(1, GREATEST(len(w) - 4, 0))) AS t(i)
    ), eval_grams AS (
        SELECT DISTINCT g FROM grams WHERE is_eval
    ), contaminated AS (
        SELECT DISTINCT gr.doc_id
        FROM grams gr JOIN eval_grams e USING (g)
        WHERE NOT gr.is_eval
    )
    SELECT t.source,
           COUNT(*) AS n_train_docs,
           COUNT(c.doc_id) AS n_contaminated
    FROM toks t LEFT JOIN contaminated c USING (doc_id)
    WHERE NOT t.is_eval
    GROUP BY t.source
    """,
)


PACK_BUDGET = 2048


def sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contiguous sequence packing: concatenate each language's documents
    in doc_id order and cut the stream every PACK_BUDGET tokens — the
    pre-training batch-construction step (documents may straddle a cut; the
    bin records where each document STARTS).

    A document's bin is floor(start_offset / budget) where start_offset is
    the running token prefix-sum before it — one window cumsum partitioned
    by lang (groups run in parallel; the per-group scan is the inherent
    sequential cost of ordered packing).  Returns per-(lang, bin) document
    counts and token totals.
    """
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "), lambda t: F.length(t) > 0))
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = d.select("lang", "doc_id", n_tokens.alias("n_tokens")).withColumn(
        "start_off", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return (
        pos.groupBy(
            "lang",
            F.floor(F.col("start_off") / PACK_BUDGET).alias("bin_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
        )
    )


_oracle(
    "sequence_packing",
    f"""
    WITH toks AS (
        SELECT lang, doc_id,
               len(list_filter(string_split(text, ' '),
                               t -> length(t) > 0)) AS n_tokens
        FROM documents
    ), pos AS (
        SELECT lang, doc_id, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) - n_tokens
                   AS start_off
        FROM toks
    )
    SELECT lang,
           CAST(FLOOR(start_off / {PACK_BUDGET}.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM pos
    GROUP BY 1, 2
    """,
)


# ---------------------------------------------------------------------------
# Tokenizer-aware (genuine BPE) token accounting
# ---------------------------------------------------------------------------

# Number of merge operations learned from corpus word frequencies.  Real
# tokenizers learn 30k+ merges from a frequency-capped SAMPLE; here the
# merge count is bounded so the driver-loop training (one distributed pair
# aggregate + one 1-row collect per merge) stays a few dozen small jobs.
BPE_MERGES = 24


def _bpe_learn(words_freq: DataFrame) -> tuple[DataFrame, list[tuple[str, str]]]:
    """Learn BPE_MERGES byte-pair merges from a (word, freq) frame and
    return (segmentations, merges): the per-word segmentation after all
    merges (word, freq, seg — seg is ' '-separated symbols with boundary
    spaces) plus the ordered merge list.

    This is genuine BPE training (Sennrich et al. 2016,
    arXiv:1508.07909): start from characters, repeatedly count adjacent
    symbol pairs weighted by word frequency, merge the most frequent pair
    (ties: lexicographically smallest), re-segment, repeat.  Two
    deliberate, mirrored determinism choices: pair counts include
    overlapping occurrences (the reference implementation's counting),
    and each merge is applied with a single left-to-right non-overlapping
    scan — both Spark's and DuckDB's ``replace`` share exactly that scan
    semantics, so the oracle (an unrolled stage-per-merge SQL chain)
    reproduces the learned merges bit-for-bit.  The single-scan
    application diverges from canonical BPE on ANY back-to-back
    occurrence of the merged pair, because adjacent occurrences share a
    separator space: in ' a b a b ' the scan consumes ' a b ' once and
    resumes after its trailing space, so only the first occurrence merges
    per pass (runs of identical symbols are the same phenomenon).  A pair
    left unmerged this way can win a later iteration again, so
    ``bpe_merges`` may legitimately contain repeated (pa, pb) entries.
    Both sides of the oracle comparison share the behavior exactly; this
    is a fidelity-to-reference-BPE note, not an impl-vs-oracle risk.

    Scale shape (100 TB): training runs over the DISTINCT-WORD frame
    (bounded by corpus vocabulary, not corpus size), each iteration one
    distributed aggregate with map-side combine plus a 1-row argmax
    collect — the same scalar-driver-state pattern as pagerank/BFS.  The
    per-iteration replace chain stays a narrow row-local expression.
    """
    from airflow_postgres_to_s3_pipeline_spark.cache import tracked_persist

    # Persist the vocabulary frame BEFORE the iteration loop: every
    # merge's 1-row argmax action replays its full lineage, so without
    # this barrier all BPE_MERGES iterations re-run the corpus
    # tokenize+explode+groupBy from parquet (r10 review) — ~25 corpus
    # passes where the docstring promises vocabulary-bounded training.
    # With it, each iteration replays only the growing (row-local)
    # replace chain over the thin (word, freq) frame.
    words_freq = tracked_persist(words_freq)
    seg0 = F.concat(
        F.lit(" "), F.array_join(F.split("word", ""), " "), F.lit(" ")
    )
    cur = words_freq.select("word", "freq", seg0.alias("seg"))
    merges: list[tuple[str, str]] = []
    pair_expr = F.expr(
        "zip_with(slice(l, 1, greatest(size(l) - 1, 0)),"
        "         slice(l, 2, greatest(size(l) - 1, 0)),"
        "         (a, b) -> struct(a AS pa, b AS pb))"
    )
    for _ in range(BPE_MERGES):
        syms = F.filter(F.split("seg", " "), lambda s: F.length(s) > 0)
        best = (
            cur.select("freq", syms.alias("l"))
            .select("freq", F.explode(pair_expr).alias("p"))
            .groupBy(F.col("p.pa").alias("pa"), F.col("p.pb").alias("pb"))
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "pa", "pb")
            .first()  # 1-row argmax scalar, not a materialization
        )
        if best is None:
            break
        pa, pb = best["pa"], best["pb"]
        merges.append((pa, pb))
        cur = cur.withColumn(
            "seg",
            F.replace("seg", F.lit(f" {pa} {pb} "), F.lit(f" {pa}{pb} ")),
        )
    return cur, merges


def _doc_bpe_tokens(d: DataFrame) -> DataFrame:
    """Per-document BPE-tokenizer token counts over any documents-shaped
    (lang, doc_id, text) frame: train merges on the corpus's own word
    frequencies (see _bpe_learn), then cost each word at its final symbol
    count.  The token-cost table is vocabulary-sized, joined back to the
    exploded corpus on word (AQE broadcasts it when small).

    Returns (lang, doc_id, n_words, bpe_tokens) for EVERY document, with
    zero-word documents kept at 0/0 (packing must not drop them).
    """
    words_arr = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    words = d.select("lang", "doc_id", F.explode(words_arr).alias("word"))
    freq = words.groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    segs, _ = _bpe_learn(freq)
    n_tok = F.size(F.filter(F.split("seg", " "), lambda s: F.length(s) > 0))
    costs = segs.select("word", n_tok.cast("long").alias("n_tok"))
    per_doc = (
        words.join(costs, "word")
        .groupBy("lang", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum("n_tok").alias("bpe_tokens"),
        )
    )
    return (
        d.select("lang", "doc_id")
        .join(per_doc, ["lang", "doc_id"], "left")
        .select(
            "lang",
            "doc_id",
            F.coalesce("n_words", F.lit(0).cast("long")).alias("n_words"),
            F.coalesce("bpe_tokens", F.lit(0).cast("long")).alias("bpe_tokens"),
        )
    )


def _bpe_training_sql(n_merges: int = BPE_MERGES) -> str:
    """Unrolled DuckDB mirror of _bpe_learn: one (pair-count -> argmax ->
    replace) CTE triple per merge.  Returns the CTE chain text ending with
    ``bpe_costs`` (word -> n_tok) and ``bpe_merges`` (rank, pa, pb)."""
    stages = [
        """wf AS MATERIALIZED (
        SELECT word, COUNT(*) AS freq FROM (
            SELECT UNNEST(list_filter(string_split(text, ' '),
                                      w -> len(w) > 0)) AS word
            FROM documents) GROUP BY word
    ), s0 AS MATERIALIZED (
        SELECT word, freq,
               ' ' || array_to_string(string_split(word, ''), ' ') || ' ' AS seg
        FROM wf
    )"""
    ]
    for i in range(n_merges):
        stages.append(f"""pr{i} AS MATERIALIZED (
        SELECT l[x] AS pa, l[x+1] AS pb, SUM(freq) AS cnt
        FROM (SELECT freq, list_filter(string_split(seg, ' '),
                                       s -> len(s) > 0) AS l FROM s{i}) t,
             UNNEST(range(1, len(l))) AS u(x)
        GROUP BY 1, 2
    ), b{i} AS MATERIALIZED (
        SELECT COALESCE(MIN(pa), '') AS pa, COALESCE(MIN(pb), '') AS pb
        FROM (SELECT pa, pb FROM pr{i} ORDER BY cnt DESC, pa, pb LIMIT 1)
    ), s{i + 1} AS MATERIALIZED (
        SELECT word, freq,
               CASE WHEN b.pa = '' THEN seg
                    ELSE replace(seg, ' '||b.pa||' '||b.pb||' ',
                                      ' '||b.pa||b.pb||' ')
               END AS seg
        FROM s{i}, b{i} b
    )""")
    stages.append(f"""bpe_costs AS (
        SELECT word,
               CAST(len(list_filter(string_split(seg, ' '),
                                    s -> len(s) > 0)) AS BIGINT) AS n_tok
        FROM s{n_merges}
    ), bpe_merges AS (
        {" UNION ALL ".join(
            f"SELECT {i + 1} AS merge_rank, pa, pb FROM b{i}"
            for i in range(n_merges)
        )}
    )""")
    return ", ".join(stages)


_BPE_PER_DOC_SQL = f"""
    {_bpe_training_sql()}, words AS (
        SELECT lang, doc_id,
               UNNEST(list_filter(string_split(text, ' '),
                                  w -> len(w) > 0)) AS word
        FROM documents
    ), per_doc AS (
        SELECT w.lang, w.doc_id,
               COUNT(*) AS n_words,
               SUM(c.n_tok) AS bpe_tokens
        FROM words w JOIN bpe_costs c USING (word)
        GROUP BY w.lang, w.doc_id
    ), toks AS (
        SELECT d.lang, d.doc_id,
               CAST(COALESCE(p.n_words, 0) AS BIGINT) AS n_words,
               CAST(COALESCE(p.bpe_tokens, 0) AS BIGINT) AS bpe_tokens
        FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.doc_id
    )"""


def bpe_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Genuine-BPE token counting: merges learned from the corpus's own
    word frequencies (see _bpe_learn), each word costed at its merged
    symbol count.

    The whitespace `token_count` entry under-counts versus a tokenizer;
    at 100 TB that error is the difference between a correct and a blown
    pre-training token budget, so packing and mixing budgets should be
    denominated in THESE counts (see ``sequence_packing_bpe``).
    """
    d = table(spark, sf_dir, "documents")
    return _doc_bpe_tokens(d).select("doc_id", "n_words", "bpe_tokens")


_oracle(
    "bpe_token_count",
    f"""
    WITH {_BPE_PER_DOC_SQL}
    SELECT doc_id, n_words, bpe_tokens FROM toks
    """,
)


def bpe_merges_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The learned BPE merge table itself, as a relation (merge_rank, pa,
    pb) — the direct evidence that training is genuine and deterministic:
    the oracle RE-LEARNS the merges in DuckDB from the same parquet via
    the unrolled stage-per-merge SQL and must reproduce them exactly."""
    words_arr = F.filter(F.split("text", " "), lambda t: F.length(t) > 0)
    d = table(spark, sf_dir, "documents")
    freq = (
        d.select(F.explode(words_arr).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    _, merges = _bpe_learn(freq)
    return spark.createDataFrame(
        [(i + 1, pa, pb) for i, (pa, pb) in enumerate(merges)],
        "merge_rank int, pa string, pb string",
    )


_oracle(
    "bpe_merges",
    f"""
    WITH {_bpe_training_sql()}
    SELECT CAST(merge_rank AS INTEGER) AS merge_rank, pa, pb
    FROM bpe_merges WHERE pa <> ''
    """,
)


def _pack_bins(per_doc: DataFrame, budget: int) -> DataFrame:
    """Cut each language's doc_id-ordered token stream every ``budget``
    tokens; a doc's bin = floor(prefix-sum-before-it / budget)."""
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pos = per_doc.withColumn(
        "start_off", F.sum("bpe_tokens").over(w) - F.col("bpe_tokens")
    )
    return pos.groupBy(
        "lang", F.floor(F.col("start_off") / budget).alias("bin_id")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("bpe_tokens").alias("total_tokens"),
    )


def sequence_packing_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``sequence_packing`` with the budget denominated in genuine BPE
    tokens (corpus-trained merges, see _bpe_learn) instead of whitespace
    words — the version a real pre-training batch builder needs.

    Same shape as the whitespace tier (per-lang window prefix-sum, groups
    parallel across languages; at 100 TB pack within (lang, shard)), plus
    the vocabulary-sized token-cost join from ``_doc_bpe_tokens`` upstream.
    """
    d = table(spark, sf_dir, "documents")
    return _pack_bins(_doc_bpe_tokens(d), PACK_BUDGET)


_oracle(
    "sequence_packing_bpe",
    f"""
    WITH {_BPE_PER_DOC_SQL}, pos AS (
        SELECT lang, doc_id, bpe_tokens,
               SUM(bpe_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING) - bpe_tokens
                   AS start_off
        FROM toks
    )
    SELECT lang,
           CAST(FLOOR(start_off / {PACK_BUDGET}.0) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(bpe_tokens) AS BIGINT) AS total_tokens
    FROM pos
    GROUP BY 1, 2
    """,
)


# Systematic (stochastic-universal) weighted sampling: SUS_SAMPLES pointers
# spaced W/n apart over the integer cumulative-weight line.  4096 docs per
# prefix-sum bucket keeps bucket boundaries data-independent (pure doc_id
# arithmetic), so the selected set is identical under any partitioning.
SUS_SAMPLES = 500
SUS_BUCKET = 4096


def weighted_sample_sus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional corpus sampling via systematic selection
    (stochastic universal sampling) on an INTEGER cumulative-weight line.

    The training-data use: sample documents proportional to size (here
    ``n_chars``; any integer quality/token weight drops in) so the drawn
    set is uniform over *content* rather than over documents — the
    denomination that matters when the budget is tokens, not rows.  Unlike
    rejection or A-ES exponential-key sampling, SUS is exact integer
    arithmetic end-to-end: no ln/pow calls whose last-ulp differences
    across engines (see functions/numeric.py) would make the selected set
    engine-dependent.  A document may be drawn more than once when its
    weight exceeds the pointer stride W/n (``n_copies`` — the with-
    multiplicity semantics every SUS implementation has).

    Selection rule: with total weight W, n = SUS_SAMPLES pointers sit at
    positions (off + k*W)/n, off = md5-derived in [0, W).  Document i
    covering the cumulative interval [c_lo, c_hi) is drawn
    ``ceil((n*c_hi - off)/W) - ceil((n*c_lo - off)/W)`` times — every
    operand is a nonnegative int64, so floor/truncating division agree and
    DuckDB mirrors the arithmetic exactly.

    Scale shape (100 TB): the global prefix sum is the textbook two-phase
    scan — (1) per-bucket totals (bucket = doc_id DIV 4096, one shuffle of
    n/4096 thin rows), (2) an ordered cumsum over the tiny bucket frame,
    (3) a bucket-partitioned within-bucket cumsum; no global-order window
    ever sees corpus-sized input.  At 10^12 docs the bucket frame itself
    (2.4e8 rows) gets one more level of the same bucketing.  Precondition:
    n * W < 2^63 — beyond that, shard by source and allocate per-shard
    pointer budgets (which is how corpus mixes are specified anyway).
    """
    d = table(spark, sf_dir, "documents").select(
        "doc_id", "source", "lang", F.col("n_chars").cast("long").alias("w")
    )
    from airflow_postgres_to_s3_pipeline_spark.cache import tracked_persist

    b = d.withColumn("bucket", F.expr(f"doc_id DIV {SUS_BUCKET}"))
    # persisted: the thin n/4096-row bucket-total frame feeds BOTH the
    # offset prefix sum and the total-weight scalar below; without the
    # barrier each consumer re-runs the corpus scan + bucket aggregate
    bucket_w = tracked_persist(b.groupBy("bucket").agg(F.sum("w").alias("bw")))
    bucket_offsets = (
        bucket_w
        .withColumn(
            "boff",
            F.coalesce(
                F.sum("bw").over(
                    Window.orderBy("bucket").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0).cast("long"),
            ),
        )
        .select("bucket", "boff")
    )
    within = (
        Window.partitionBy("bucket")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = (
        b.join(F.broadcast(bucket_offsets), "bucket")
        .withColumn("c_hi", F.col("boff") + F.sum("w").over(within))
        .withColumn("c_lo", F.col("c_hi") - F.col("w"))
    )
    # total weight from the ALREADY-AGGREGATED n/4096-row bucket frame,
    # not a third corpus scan (r10 review) — sum(bw) == sum(w) exactly
    # (both are int64 sums of the same addends, associativity exact)
    totals = bucket_w.agg(F.sum("bw").alias("tw")).withColumn(
        "off",
        F.conv(
            F.substring(F.md5(F.lit("sus-offset-v1").cast("binary")), 1, 15),
            16,
            10,
        ).cast("long")
        % F.col("tw"),
    )
    return (
        cum.crossJoin(F.broadcast(totals))
        .withColumn(
            "n_copies",
            F.expr(
                f"(({SUS_SAMPLES} * c_hi - off + tw - 1) DIV tw)"
                f" - (({SUS_SAMPLES} * c_lo - off + tw - 1) DIV tw)"
            ),
        )
        .filter(F.col("n_copies") >= 1)
        .select(
            "doc_id", "source", "lang",
            F.col("w").alias("n_chars"), "n_copies",
        )
    )


_oracle(
    "weighted_sample_sus",
    f"""
    WITH d AS (
        SELECT doc_id, source, lang, CAST(n_chars AS BIGINT) AS w
        FROM documents
    ), c AS (
        SELECT doc_id, source, lang, w,
               CAST(SUM(w) OVER (ORDER BY doc_id ROWS UNBOUNDED PRECEDING)
                    AS BIGINT) AS c_hi
        FROM d
    ), t AS (
        SELECT CAST(SUM(w) AS BIGINT) AS tw FROM d
    ), o AS (
        SELECT tw,
               ('0x' || substring(md5('sus-offset-v1'), 1, 15))::BIGINT % tw
                   AS off
        FROM t
    )
    SELECT doc_id, source, lang, w AS n_chars,
           CAST((({SUS_SAMPLES} * c_hi - off + tw - 1) // tw)
                - (({SUS_SAMPLES} * (c_hi - w) - off + tw - 1) // tw)
                AS BIGINT) AS n_copies
    FROM c, o
    WHERE (({SUS_SAMPLES} * c_hi - off + tw - 1) // tw)
          - (({SUS_SAMPLES} * (c_hi - w) - off + tw - 1) // tw) >= 1
    """,
)


def sequence_packing_ffd(spark: SparkSession, sf_dir: str,
                         budget: int = PACK_BUDGET) -> DataFrame:
    """First-fit-decreasing sequence packing: whole documents only (no
    straddling), each placed into the first bin with room, largest first
    — the padding-minimizing batch constructor used when documents must
    not be split across training sequences (instruction tuning, anything
    with per-document loss masking).

    Complements ``sequence_packing`` (contiguous stream cut, documents
    straddle bins, bin count = ceil(total/budget) by construction): FFD
    trades that optimal density for document integrity, with the classic
    11/9·OPT + 6/9 worst-case guarantee.

    This is the engine's honest STATEFUL-ALGORITHM tier: first-fit is
    inherently sequential over all open bins, which no SQL window
    expresses — so it runs as applyInPandas per language group
    (Arrow-batched; at 100 TB pack within (lang, shard) exactly like the
    contiguous tier's scale note).  Deterministic: the (tokens desc,
    doc_id) sort is total, so bin assignment is partition-independent.

    FULL oracle (upgraded from rows-only per the r8 verdict): the DuckDB
    side replays the identical FFD pass as a recursive CTE whose state
    row per language carries the open-bin lists (remaining capacity, doc
    count, token total) as LIST columns and places one document per
    iteration over the same (tokens desc, doc_id) order — so the driver
    hash-checks the exact bin assignment, not just the row count.
    Iteration depth = max docs per language, the same quantity the
    per-(lang, shard) packing unit bounds at scale.
    """
    import pandas as pd

    d = table(spark, sf_dir, "documents")
    n_tokens = F.least(
        F.size(F.filter(F.split("text", " "), lambda t: F.length(t) > 0)),
        F.lit(budget),
    )
    docs = d.select("lang", "doc_id", n_tokens.alias("n_tokens"))

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        )
        lang = pdf["lang"].iloc[0]
        remaining: list[int] = []
        n_docs: list[int] = []
        totals: list[int] = []
        for tok in pdf["n_tokens"]:
            tok = int(tok)
            for i, r in enumerate(remaining):
                if r >= tok:
                    remaining[i] -= tok
                    n_docs[i] += 1
                    totals[i] += tok
                    break
            else:
                remaining.append(budget - tok)
                n_docs.append(1)
                totals.append(tok)
        return pd.DataFrame(
            {
                "lang": lang,
                "bin_id": range(len(totals)),
                "n_docs": n_docs,
                "total_tokens": totals,
            }
        )

    return docs.groupBy("lang").applyInPandas(
        pack, "lang string, bin_id long, n_docs long, total_tokens long"
    )


# Recursive-CTE replay of the exact FFD pass (see docstring): one state
# row per language, one document placed per iteration, open bins carried
# as LIST columns and updated by slice-splice at the first-fit position.
_oracle(
    "sequence_packing_ffd",
    f"""
    WITH RECURSIVE sized AS (
      SELECT lang, doc_id,
             LEAST(len(list_filter(str_split(text, ' '),
                                   w -> len(w) > 0)),
                   {PACK_BUDGET}) AS tok
      FROM documents
    ), ordered AS (
      SELECT lang, doc_id, tok,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY tok DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM sized
    ), pack AS (
      SELECT lang, CAST(0 AS BIGINT) AS i, n,
             CAST([] AS BIGINT[]) AS rem,
             CAST([] AS BIGINT[]) AS ndocs,
             CAST([] AS BIGINT[]) AS tot
      FROM (SELECT DISTINCT lang, n FROM ordered)
      UNION ALL
      SELECT p.lang, p.i + 1, p.n,
             CASE WHEN x.idx IS NULL OR x.idx = 0
                  THEN list_append(p.rem, {PACK_BUDGET} - x.tok)
                  ELSE p.rem[1:x.idx-1] || [p.rem[x.idx] - x.tok]
                       || p.rem[x.idx+1:] END,
             CASE WHEN x.idx IS NULL OR x.idx = 0
                  THEN list_append(p.ndocs, 1)
                  ELSE p.ndocs[1:x.idx-1] || [p.ndocs[x.idx] + 1]
                       || p.ndocs[x.idx+1:] END,
             CASE WHEN x.idx IS NULL OR x.idx = 0
                  THEN list_append(p.tot, x.tok)
                  ELSE p.tot[1:x.idx-1] || [p.tot[x.idx] + x.tok]
                       || p.tot[x.idx+1:] END
      FROM pack p
      JOIN ordered o ON o.lang = p.lang AND o.rn = p.i + 1
      CROSS JOIN LATERAL (
        SELECT o.tok AS tok,
               list_position(list_transform(p.rem, r -> r >= o.tok),
                             true) AS idx
      ) x
      WHERE p.i < p.n
    )
    SELECT lang,
           unnest(generate_series(1, len(ndocs))) - 1 AS bin_id,
           unnest(ndocs) AS n_docs,
           unnest(tot) AS total_tokens
    FROM pack WHERE i = n
    """,
)


# ---------------------------------------------------------------------------
# DSIR-style importance resampling (hashed n-gram importance weights)
# ---------------------------------------------------------------------------

DSIR_BUCKETS = 256          # hashed feature space (DSIR uses 10^4; scale-free)
DSIR_TARGET_SOURCE = "src0" # proxy for the curated/high-quality target domain
DSIR_TOP_K = 100


def dsir_importance_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al. 2023):
    score every raw-pool document by how target-like its hashed n-gram
    features are, and keep the top-K — the importance-weighting way to
    tilt a 100 TB crawl toward a small curated target domain without
    training a classifier.

    Two bag-of-ngrams models over a B-bucket hashed feature space
    (unigrams + adjacent bigrams, md5-hashed):  p = target (source =
    DSIR_TARGET_SOURCE), q = raw pool (every other source).  A document's
    log importance weight is  sum over its feature occurrences of
    ln p_b - ln q_b  with add-one smoothing.  DSIR then samples by
    weight + Gumbel noise; the engine's deterministic variant takes the
    top-K by weight (ties by doc_id) — same tilt, reproducible.

    Determinism: per-bucket log-ratios are snapped to integer micro-nats
    (the ngram_lm_score pattern — one cross-engine-safe ln per bucket,
    everything after is exact int64 sums).

    Scale shape (100 TB): features are built ROW-LOCALLY (split + slice
    zip — no shuffle); fitting both models is one B-row aggregate each
    side over a map-side-combined groupBy (B = 256 keys, so the partials
    collapse to <= B rows per task before the shuffle); the per-bucket
    log-ratio table is <= B rows and BROADCASTS onto the feature stream;
    scoring is one doc_id-keyed sum shuffle; the top-K is a
    TakeOrderedAndProject, never a global sort.  Nothing here grows with
    the corpus except the two map-side-combined shuffles.
    """
    d = table(spark, sf_dir, "documents")
    words = F.filter(F.split("text", " "), lambda w: F.length(w) > 0)
    base = d.select(
        "doc_id", "source", words.alias("ws"), F.size(words).alias("nw")
    )
    bigrams = F.when(
        F.col("nw") >= 2,
        F.zip_with(
            F.slice("ws", F.lit(1), F.col("nw") - 1),
            F.slice("ws", F.lit(2), F.col("nw") - 1),
            lambda a, b: F.concat_ws(" ", a, b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    feats = base.select(
        "doc_id",
        "source",
        F.explode(F.concat(F.col("ws"), bigrams)).alias("feat"),
    ).select(
        "doc_id",
        "source",
        (
            F.conv(F.substring(F.md5(F.col("feat").cast("binary")), 1, 15),
                   16, 10).cast("long") % DSIR_BUCKETS
        ).alias("b"),
    )
    is_target = F.col("source") == DSIR_TARGET_SOURCE
    # ONE conditional aggregation fits both models (r10 review): the
    # previous two filtered groupBys each re-ran the corpus-sized
    # explode+hash subplan and needed a full_outer join + coalesce pair
    # to reunite the 256 buckets; a single pass over the feature stream
    # computes both counts with the same map-side combine.
    lam = feats.groupBy("b").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).alias("tc"),
        F.sum(F.when(~is_target, 1).otherwise(0)).alias("rc"),
    )
    tot = lam.agg(F.sum("tc").alias("_tt"), F.sum("rc").alias("_rt"))
    lam = lam.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.round(
                F.log((F.col("tc") + F.lit(1.0))
                      / (F.col("_tt") + F.lit(float(DSIR_BUCKETS))))
                * F.lit(1000000.0)
            ).cast("bigint")
            - F.round(
                F.log((F.col("rc") + F.lit(1.0))
                      / (F.col("_rt") + F.lit(float(DSIR_BUCKETS))))
                * F.lit(1000000.0)
            ).cast("bigint")
        ).alias("lam_micro"),
    )
    scored = (
        feats.filter(~is_target)
        .join(F.broadcast(lam), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("lam_micro").alias("score_micro"),
        )
    )
    return (
        scored.select("doc_id", "n_feats", "score_micro")
        .orderBy(F.col("score_micro").desc(), F.col("doc_id").asc())
        .limit(DSIR_TOP_K)
    )


_oracle(
    "dsir_importance_sample",
    f"""
    WITH base AS (
        SELECT doc_id, source,
               list_filter(string_split(text, ' '), x -> len(x) > 0) AS ws
        FROM documents
    ), uni AS (
        SELECT doc_id, source, UNNEST(ws) AS feat FROM base
    ), bi AS (
        SELECT doc_id, source, ws[i] || ' ' || ws[i+1] AS feat
        FROM base,
             UNNEST(generate_series(1, GREATEST(len(ws) - 1, 0))) AS t(i)
    ), feats AS (
        SELECT doc_id, source,
               ('0x' || substring(md5(feat), 1, 15))::BIGINT % {DSIR_BUCKETS}
                   AS b
        FROM (SELECT * FROM uni UNION ALL SELECT * FROM bi)
    ), tgt AS (
        SELECT b, COUNT(*) AS tc FROM feats
        WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY 1
    ), raw AS (
        SELECT b, COUNT(*) AS rc FROM feats
        WHERE source <> '{DSIR_TARGET_SOURCE}' GROUP BY 1
    ), lam AS (
        SELECT COALESCE(t.b, r.b) AS b,
               CAST(round(ln((COALESCE(tc, 0) + 1.0)
                             / ((SELECT SUM(tc) FROM tgt)
                                + {DSIR_BUCKETS}.0)) * 1000000.0) AS BIGINT)
               - CAST(round(ln((COALESCE(rc, 0) + 1.0)
                               / ((SELECT SUM(rc) FROM raw)
                                  + {DSIR_BUCKETS}.0)) * 1000000.0) AS BIGINT)
                   AS lam_micro
        FROM tgt t FULL OUTER JOIN raw r ON t.b = r.b
    )
    SELECT f.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_feats,
           CAST(SUM(lam_micro) AS BIGINT) AS score_micro
    FROM feats f JOIN lam USING (b)
    WHERE f.source <> '{DSIR_TARGET_SOURCE}'
    GROUP BY f.doc_id
    ORDER BY score_micro DESC, f.doc_id ASC
    LIMIT {DSIR_TOP_K}
    """,
)


# ---------------------------------------------------------------------------
# Deterministic epoch shuffle (training-order shard assignment)
# ---------------------------------------------------------------------------

SHUFFLE_EPOCH_SEED = "epoch-1"
SHUFFLE_N_SHARDS = 8


def epoch_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data ordering: every
    document gets a shard and an in-shard position from a seeded content
    hash — the "shuffle the corpus once per epoch" step of a training
    pipeline, reproducible across re-runs and resumable mid-epoch
    (position is a pure function of (seed, doc_id), never RNG state).

    Changing SHUFFLE_EPOCH_SEED re-deals the entire order (a new epoch);
    the hash key makes placement independent of input partitioning.

    Scale shape (100 TB): the shard assignment is row-local; the in-shard
    position is a row_number per shard, i.e. ONE task per shard — which is
    exactly the write pattern for training shards (one task sorts and
    writes one shard file), so N_SHARDS scales with the corpus (~1 GB of
    tokens per shard) and each task stays bounded.  No global sort, no
    driver collect; the only shuffle is the hash repartition to shards.
    """
    d = table(spark, sf_dir, "documents")
    skey = F.md5(
        F.concat_ws(":", F.lit(SHUFFLE_EPOCH_SEED),
                    F.col("doc_id").cast("string"))
    )
    shard = (
        F.conv(F.substring(skey, 1, 15), 16, 10).cast("long")
        % SHUFFLE_N_SHARDS
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    return (
        d.select("doc_id", skey.alias("skey"), shard.alias("shard"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select("doc_id", "shard", "pos")
    )


_oracle(
    "epoch_shuffle_order",
    f"""
    WITH k AS (
        SELECT doc_id,
               md5('{SHUFFLE_EPOCH_SEED}:' || CAST(doc_id AS VARCHAR))
                   AS skey
        FROM documents
    ), s AS (
        SELECT doc_id, skey,
               ('0x' || substring(skey, 1, 15))::BIGINT % {SHUFFLE_N_SHARDS}
                   AS shard
        FROM k
    )
    SELECT doc_id, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                   ORDER BY skey, doc_id) AS BIGINT) AS pos
    FROM s
    """,
)


# ---------------------------------------------------------------------------
# Temperature-scaled mixture allocation (multilingual sampling rates)
# ---------------------------------------------------------------------------

# alpha is FIXED at 0.5 (w_l ∝ sqrt(n_l)), not a tunable: IEEE-754 sqrt is
# the only correctly-rounded power function, so sqrt keeps the micro-unit
# snap bit-identical between Spark and the DuckDB oracle — a generic
# pow(n, alpha) is not correctly rounded and could flip the rounding by an
# ULP between engines (ADVICE r5 retired the misleading alpha constant).
MIX_TOKEN_BUDGET = 1_000_000  # tokens to allocate across languages


def temperature_mix_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled corpus mixture (the multilingual-pretraining
    allocation rule, Conneau & Lample 2019): language l receives a share
    of the token budget proportional to n_l^alpha, flattening the head so
    low-resource languages are not drowned out (alpha=1 keeps natural
    proportions; alpha->0 approaches uniform).  alpha is fixed at 0.5 —
    see the note above MIX_TOKEN_BUDGET.

    Determinism: n_l^0.5 is one sqrt per language snapped to integer
    micro-units, the share denominator is an exact int64 sum of those, and
    each budget is an integer floor-division — no float summation
    anywhere.  The per-language oversample factor (budget vs natural
    tokens) comes out as one exact-int division.

    Scale shape: one map-side-combined groupBy over the corpus (per-lang
    token counts), then all arithmetic happens on a <=n_langs-row frame —
    the corpus is scanned exactly once, nothing else scales with data.
    """
    d = table(spark, sf_dir, "documents")
    n_tokens = F.size(F.filter(F.split("text", " "),
                               lambda t: F.length(t) > 0))
    per_lang = d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(n_tokens).alias("n_tokens"),
    )
    s_micro = F.round(
        F.sqrt(F.col("n_tokens").cast("double")) * F.lit(1000000.0)
    ).cast("bigint")
    weighted = per_lang.select("lang", "n_docs", "n_tokens",
                               s_micro.alias("s_micro"))
    tot = weighted.agg(F.sum("s_micro").alias("_ts"))
    # token_budget is computed once and oversample_factor derives from
    # the COLUMN (r10 review): a duplicated allocation expression would
    # let a future rule edit silently desynchronize the two.
    return (
        weighted.crossJoin(F.broadcast(tot))
        .withColumn(
            "token_budget",
            F.expr(f"CAST(({MIX_TOKEN_BUDGET} * s_micro) div _ts AS BIGINT)"),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            "s_micro",
            "token_budget",
            (
                F.col("token_budget").cast("double")
                / F.col("n_tokens").cast("double")
            ).alias("oversample_factor"),
        )
        .orderBy("lang")
    )


_oracle(
    "temperature_mix_allocation",
    f"""
    WITH per_lang AS (
        SELECT lang,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(len(list_filter(string_split(text, ' '),
                                        t -> len(t) > 0))) AS BIGINT)
                   AS n_tokens
        FROM documents
        GROUP BY lang
    ), w AS (
        SELECT lang, n_docs, n_tokens,
               CAST(round(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000.0)
                    AS BIGINT) AS s_micro
        FROM per_lang
    ), t AS (
        SELECT CAST(SUM(s_micro) AS BIGINT) AS ts FROM w
    )
    SELECT lang, n_docs, n_tokens, s_micro,
           CAST(({MIX_TOKEN_BUDGET} * s_micro) // ts AS BIGINT)
               AS token_budget,
           CAST(CAST(({MIX_TOKEN_BUDGET} * s_micro) // ts AS BIGINT)
                AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oversample_factor
    FROM w, t
    ORDER BY lang
    """,
)
