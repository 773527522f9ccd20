"""Tile-fingerprint visual near-dup (multimodal_tile_near_dup) and
container-header synth/parse (multimodal_header_parse)."""

from __future__ import annotations

from airflow_postgres_to_s3_pipeline_spark.operators import multimodal as mm


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


def test_header_parse_png_roundtrip_and_crc_rejection():
    """parse_media_header must decode a spec-correct PNG IHDR and demote
    ANY corrupted header byte to 'unknown' via the CRC check."""
    payload = mm.synth_container(2, b"hello world")
    rec = mm.parse_media_header(payload)
    assert rec["container"] == "png"
    assert rec["width"] == 2 % 1917 + 1 and rec["height"] == 2 % 1080 + 1
    assert rec["bit_depth"] == 8  # 2 % 3 != 0
    assert rec["payload_bytes"] == 33
    # flip one bit in the width field: signature still valid, CRC must catch
    corrupt = bytearray(payload)
    corrupt[16] ^= 0x01
    assert mm.parse_media_header(bytes(corrupt))["container"] == "unknown"
    # truncated mid-chunk: length guard, not an exception
    assert mm.parse_media_header(payload[:20])["container"] == "unknown"


def test_header_parse_wav_roundtrip_and_consistency_rejection():
    doc_id, text = 5, b"0123456789abcdefEXTRA"
    payload = mm.synth_container(doc_id, text)
    rec = mm.parse_media_header(payload)
    assert rec["container"] == "wav"
    assert rec["channels"] == (doc_id // 2) % 2 + 1
    assert rec["sample_rate"] == 8000 + (doc_id % 5) * 4000
    assert rec["bit_depth"] == 16
    assert rec["payload_bytes"] == 44 + 16
    # byte_rate inconsistent with sample_rate*channels*bits/8 -> rejected
    import struct

    corrupt = bytearray(payload)
    struct.pack_into("<I", corrupt, 28, 1)  # byte_rate field
    assert mm.parse_media_header(bytes(corrupt))["container"] == "unknown"


def test_header_parse_junk_is_unknown_not_exception():
    rec = mm.parse_media_header(mm.synth_container(17, b"abc"))
    assert rec["container"] == "unknown"
    assert rec["width"] is None and rec["sample_rate"] is None
    assert mm.parse_media_header(b"")["container"] == "unknown"
