#!/usr/bin/env python
"""Generate a scaled-up copy of a driver testdata dir for the sf1 probe
(r11 verdict task 2).

The driver ships sf{0.001,0.01,0.1}; validating the 100 TB posture
per-query needs one decade more.  This derives /tmp/sf1 from sf0.1 by
FACTOR-fold replication with deterministic hash perturbation, preserving
what a real scale-factor bump preserves:

- fact/dim tables (orders, lineitem, customer, part, supplier, events):
  key-remapped copies (stride offsets keep every FK join valid); value
  columns unchanged, so group-by cardinalities on status/priority stay
  fixed while group sizes grow linearly — the TPC-H scaling contract.
- documents: copy 0 verbatim; copies i>0 substitute ~40% of words keyed
  by hash(word, i), so cross-copy Jaccard lands ~0.4 — well under the
  0.6 near-dup threshold.  Verbatim replication would hand every doc 9
  exact twins and C(10,2) pair blowups per planted dup family, turning
  the dedup entries' scaling ratios into artifacts of the generator
  rather than the plan.  Within-copy dup families replicate linearly.
- embeddings: copies i>0 get per-dimension hash noise (±0.1) then
  re-normalization to unit length (the source corpus is unit-norm), so
  exact-identity groups scale linearly and cluster structure survives.
- nation/region: fixed dimensions, copied as-is.

Deterministic end to end (DuckDB hash(), no RNG) — re-running overwrites
with identical bytes.  Writes OUTSIDE /root/testdata (driver data is
read-only).

Usage: python tools/make_scaled_testdata.py [src_dir out_dir factor]
       defaults: /root/testdata/sf0.1 /tmp/sf1 10
"""

from __future__ import annotations

import os
import sys

import duckdb

# key strides: far above any source key range, so copies never collide
STRIDE = 1_000_000_000


def main() -> None:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/sf1"
    factor = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE TABLE copies AS SELECT unnest(range({factor})) AS i")

    def write(name: str, sql: str) -> None:
        con.execute(
            f"COPY ({sql}) TO '{out}/{name}.parquet' (FORMAT PARQUET)"
        )
        n = con.execute(
            f"SELECT count(*) FROM '{out}/{name}.parquet'"
        ).fetchone()[0]
        print(f"{name}: {n} rows")

    for name in ("region", "nation"):
        write(name, f"SELECT * FROM '{src}/{name}.parquet'")

    write("customer", f"""
        SELECT c_custkey + i*{STRIDE} AS c_custkey, c_name, c_nationkey,
               c_acctbal, c_mktsegment
        FROM '{src}/customer.parquet', copies""")
    write("supplier", f"""
        SELECT s_suppkey + i*{STRIDE} AS s_suppkey, s_name, s_nationkey,
               s_acctbal
        FROM '{src}/supplier.parquet', copies""")
    write("part", f"""
        SELECT p_partkey + i*{STRIDE} AS p_partkey, p_name, p_brand,
               p_type, p_size, p_retailprice
        FROM '{src}/part.parquet', copies""")
    write("orders", f"""
        SELECT o_orderkey + i*{STRIDE} AS o_orderkey,
               o_custkey + i*{STRIDE} AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM '{src}/orders.parquet', copies""")
    write("lineitem", f"""
        SELECT l_orderkey + i*{STRIDE} AS l_orderkey,
               l_partkey + i*{STRIDE} AS l_partkey,
               l_suppkey + i*{STRIDE} AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM '{src}/lineitem.parquet', copies""")
    write("events", f"""
        SELECT event_id + i*{STRIDE} AS event_id, ts,
               user_id + i*{STRIDE} AS user_id,
               event_type, value, props
        FROM '{src}/events.parquet', copies""")
    write("documents", f"""
        SELECT doc_id + i*{STRIDE} AS doc_id,
               CASE WHEN i = 0 THEN text
                    ELSE array_to_string(list_transform(
                        string_split(text, ' '),
                        w -> CASE WHEN hash(w || '-' || i) % 100 < 40
                                  THEN w || 'q' || i ELSE w END), ' ')
               END AS text,
               lang, source,
               CASE WHEN i = 0 THEN n_chars
                    ELSE length(array_to_string(list_transform(
                        string_split(text, ' '),
                        w -> CASE WHEN hash(w || '-' || i) % 100 < 40
                                  THEN w || 'q' || i ELSE w END), ' '))
               END AS n_chars
        FROM '{src}/documents.parquet', copies""")
    write("embeddings", f"""
        WITH noisy AS (
            SELECT vec_id + i*{STRIDE} AS vec_id, label,
                   CASE WHEN i = 0 THEN embedding
                        ELSE list_transform(embedding, (x, d) ->
                            CAST(x + (CAST(hash(vec_id*131 + i*17 + d)
                                           % 2001 AS BIGINT)
                                      - 1000) / 10000.0 AS FLOAT))
                   END AS emb
            FROM '{src}/embeddings.parquet', copies
        )
        SELECT vec_id,
               list_transform(emb, x -> CAST(x /
                   sqrt(list_sum(list_transform(emb, y -> y*y)))
                   AS FLOAT)) AS embedding,
               label
        FROM noisy""")
    print(f"done: {out} at factor {factor}")


if __name__ == "__main__":
    main()
