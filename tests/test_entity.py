"""Entity resolution (operators/entity.py): the blocking recall guarantee
and survivorship correctness that the DuckDB oracle alone can't certify.

The oracle proves Spark == DuckDB for the *blocked* computation; these
tests prove the blocked computation equals the unblocked ground truth —
i.e. that multi-pass token blocking loses no edit-distance<=2 pair on this
vocabulary — and that cluster labels propagate across the full diameter-3
chain (cold—old—red—new), the bug a too-short propagation loop would hide.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import entity

SF_DIR = "/root/testdata/sf0.001"


def _ground_truth_pairs(spark):
    """Unblocked all-pairs edit-distance<=2 over distinct names (64 names →
    2016 candidate pairs: affordable as a TEST oracle, never as the plan)."""
    names = (
        table(spark, SF_DIR, "part").select(F.col("p_name").alias("name")).distinct()
    )
    a = names.select(F.col("name").alias("name_a"))
    b = names.select(F.col("name").alias("name_b"))
    return (
        a.crossJoin(b)
        .filter(F.col("name_a") < F.col("name_b"))
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b"))
        .filter((F.col("edit_dist") >= 1) & (F.col("edit_dist") <= entity.MAX_DIST))
        .select("name_a", "name_b", "edit_dist")
    )


def test_multi_pass_blocking_has_full_recall(spark):
    truth = {
        (r.name_a, r.name_b, r.edit_dist)
        for r in _ground_truth_pairs(spark).collect()
    }
    blocked = {
        (r.name_a, r.name_b, r.edit_dist)
        for r in entity.fuzzy_match_parts(spark, SF_DIR).collect()
    }
    assert truth, "vocabulary drifted: no edit-distance<=2 pairs at all"
    assert blocked == truth


def test_match_carries_record_counts(spark):
    counts = {
        r.name: r.n_records
        for r in table(spark, SF_DIR, "part")
        .groupBy(F.col("p_name").alias("name"))
        .count()
        .withColumnRenamed("count", "n_records")
        .collect()
    }
    for r in entity.fuzzy_match_parts(spark, SF_DIR).collect():
        assert r.records_a == counts[r.name_a]
        assert r.records_b == counts[r.name_b]


def test_canonicalize_spans_diameter_3_chain(spark):
    """'new X' sits 3 hops from 'cold X' (new—red—old—cold); both must land
    in the same cluster with the same canonical spelling."""
    rows = entity.fuzzy_canonicalize_parts(spark, SF_DIR).collect()
    canon = {r.name: r.canonical_name for r in rows}
    nouns = {n.split(" ", 1)[1] for n in canon}
    assert nouns, "no clusters found"
    for noun in nouns:
        chain = [f"{adj} {noun}" for adj in ("cold", "old", "red", "new")]
        present = [n for n in chain if n in canon]
        assert len(present) == 4, f"chain incomplete for {noun}: {present}"
        labels = {canon[n] for n in present}
        assert len(labels) == 1, f"cluster split for {noun}: {labels}"


def test_canonical_is_majority_then_lexicographic(spark):
    counts = {
        r.name: r.n_records
        for r in table(spark, SF_DIR, "part")
        .groupBy(F.col("p_name").alias("name"))
        .count()
        .withColumnRenamed("count", "n_records")
        .collect()
    }
    rows = entity.fuzzy_canonicalize_parts(spark, SF_DIR).collect()
    clusters: dict[str, list[str]] = {}
    for r in rows:
        clusters.setdefault(r.canonical_name, []).append(r.name)
    for canonical, members in clusters.items():
        assert canonical in members
        best = max(counts[m] for m in members)
        expect = min(m for m in members if counts[m] == best)
        assert canonical == expect
        # cluster_records is the sum over members
        total = sum(counts[m] for m in members)
        got = {r.cluster_records for r in rows if r.canonical_name == canonical}
        assert got == {total}


def test_stop_token_cap_bounds_hot_blocks(spark, monkeypatch):
    """With the cap below every block size, all blocking keys are dropped and
    the candidate set is empty — the skew bound actually gates."""
    monkeypatch.setattr(entity, "MAX_BLOCK", 1)
    assert entity.fuzzy_match_parts(spark, SF_DIR).count() == 0


def test_snm_recall_tradeoff_is_pinned(spark):
    """Sorted-neighborhood matching: every pair it finds is a true pair
    (subset of the unblocked ground truth), and the pairs it misses are
    EXACTLY the new<->red family — the documented both-orderings-diverge
    case.  If vocabulary or window changes silently alter recall, this
    fails loudly."""
    truth = {
        (r.name_a, r.name_b): r.edit_dist
        for r in _ground_truth_pairs(spark).collect()
    }
    snm = {
        (r.name_a, r.name_b): r.edit_dist
        for r in entity.fuzzy_match_sorted_neighborhood(
            spark, SF_DIR
        ).collect()
    }
    assert set(snm) <= set(truth)
    for pair, dist in snm.items():
        assert truth[pair] == dist
    missed = set(truth) - set(snm)
    assert missed == {
        (f"new {noun}", f"red {noun}")
        for noun in (
            "anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod",
            "widget",
        )
    }


def test_empty_second_token_blocking_matches_oracle(spark, tmp_path):
    """Names with trailing/consecutive spaces produce an EMPTY second
    token: Spark's split().getItem(1) yields '' where the oracle's
    NULLIF yields NULL, so pass 2 must not pair such names on '' (r10
    review — the pair ('ab ', 'ac ') formed on Spark but not in SQL).
    Both engines now NULLIF; compare them on a planted vocabulary."""
    import duckdb

    rows = [
        (1, "ab "),          # trailing space -> empty second token
        (2, "ac "),          # levenshtein('ab ', 'ac ') = 1
        (3, "xy  z"),        # consecutive spaces -> empty second token
        (4, "xz  z"),        # would pair with 3 via blk='' without the fix
        (5, "cold widget"),  # a genuine two-token pair
        (6, "bold widget"),
    ]
    d = str(tmp_path / "parts")
    spark.createDataFrame(rows, "p_partkey long, p_name string").write.parquet(
        f"{d}/part.parquet"
    )
    got = sorted(
        (r.name_a, r.name_b, r.edit_dist)
        for r in entity.fuzzy_match_parts(spark, d).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW part AS SELECT * FROM '{d}/part.parquet/*.parquet'"
    )
    from airflow_postgres_to_s3_pipeline_spark.registry import ORACLES

    want = sorted(
        (r[0], r[1], r[2])
        for r in con.sql(ORACLES["fuzzy_match_parts"]).fetchall()
    )
    assert got == want
    # the genuine pair survives; pass 1 still pairs 'ab '/'ac ' on their
    # FIRST tokens? no — 'ab' != 'ac' — so they pair only via the (kept)
    # levenshtein over pass-1 blocks when first tokens match, which they
    # don't here: the empty-token pairs must be absent entirely
    names = {(a, b) for a, b, _ in got}
    assert ("cold widget", "bold widget") in names or (
        "bold widget", "cold widget") in names
    assert ("ab ", "ac ") not in names
    assert ("xy  z", "xz  z") not in names
