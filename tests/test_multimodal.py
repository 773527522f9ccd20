"""Tile-fingerprint visual near-dup (multimodal_tile_near_dup)."""

from __future__ import annotations


def test_tile_near_dup_finds_planted_pair(spark, tmp_path):
    """Two payloads identical in >= MIN_MATCH tiles pair up; payloads
    sharing only one tile (or only empty-padding tiles) do not."""
    from airflow_postgres_to_s3_pipeline_spark.operators import multimodal as mm

    tb = mm.TILE_BYTES
    base = "".join(chr(ord("a") + (i // tb) % 26) * 1 for i in range(tb * 8))
    # near-dup: differs only inside tile 3
    near = base[: 3 * tb] + "X" * tb + base[4 * tb:]
    # one-tile coincidence: shares ONLY tile 0 with base
    onetile = base[:tb] + "Z" * (tb * 7)
    # short docs: must not pair via out-of-range tiles
    short_a, short_b = "pp", "qq"
    rows = [
        (0, base, "en", "s", len(base)),
        (1, near, "en", "s", len(near)),
        (2, onetile, "en", "s", len(onetile)),
        (3, short_a, "en", "s", len(short_a)),
        (4, short_b, "en", "s", len(short_b)),
    ]
    out = str(tmp_path / "docs")
    spark.createDataFrame(
        rows, ["doc_id", "text", "lang", "source", "n_chars"]
    ).write.parquet(out + "/documents.parquet")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_match_tiles"]
        for r in mm.multimodal_tile_near_dup(spark, out).collect()
    }
    assert got == {(0, 1): 7}
