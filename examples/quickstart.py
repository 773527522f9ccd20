"""End-to-end quickstart: the engine's main surfaces in one runnable script.

    python examples/quickstart.py [sf_dir]

Walks the LLM-data-pipeline path the engine is built for:
  1. relational analytics over the star schema (pricing summary, top-k)
  2. corpus curation (quality filter -> dedup -> deterministic split)
  3. near-dup clustering (MinHash-LSH -> connected components)
  4. vector search (exact top-k cosine neighbors)
  5. streaming (watermarked tumbling counts driven to completion)
  6. export (distributed CSV write, the reference's S3 sink shape)
"""

from __future__ import annotations

import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> int:
    from pyspark.sql import functions as F

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from airflow_postgres_to_s3_pipeline_spark import get_spark
    from airflow_postgres_to_s3_pipeline_spark import registry
    from airflow_postgres_to_s3_pipeline_spark.pipeline import export_to_storage

    spark = get_spark(app_name="quickstart")
    spark.sparkContext.setLogLevel("ERROR")

    print("== 1. pricing summary (TPC-H Q1 shape)")
    registry.QUERIES["pricing_summary"](spark, sf_dir).show(truncate=False)

    print("== 2. corpus curation (quality -> dedup -> split)")
    curated = registry.QUERIES["corpus_curation"](spark, sf_dir)
    print(f"   admitted {curated.count()} documents")

    print("== 3. near-dup clusters (MinHash-LSH + connected components)")
    registry.QUERIES["dedup_components"](spark, sf_dir).show(5)

    print("== 4. exact top-k neighbors over embeddings")
    registry.QUERIES["knn_bruteforce"](spark, sf_dir).show(5)

    print("== 5. streaming tumbling counts (readStream -> memory sink)")
    registry.QUERIES["streaming_tumbling_agg"](spark, sf_dir).show(5)

    print("== 6. distributed CSV export (the reference's S3 sink shape)")
    out = os.path.join(tempfile.mkdtemp(prefix="quickstart_"), "export")
    export_to_storage(
        registry.QUERIES["export_projection_filter"](spark, sf_dir), out
    )
    n_parts = len([f for f in os.listdir(out) if f.endswith(".csv")])
    print(f"   wrote {n_parts} csv part files to {out}")

    print("== 7. entity resolution (blocked fuzzy match -> canonical names)")
    matches = registry.QUERIES["fuzzy_match_parts"](spark, sf_dir)
    canon = registry.QUERIES["fuzzy_canonicalize_parts"](spark, sf_dir)
    print(f"   near-duplicate name pairs (edit distance <= 2): {matches.count()}")
    canon.orderBy("canonical_name", "name").show(5)

    print("== 8. training-data construction (admission dedup -> weighted "
          "sample -> triplets)")
    adm = registry.QUERIES["embedding_incremental_dedup"](spark, sf_dir)
    counts = adm.agg(
        F.count(F.lit(1)).alias("total"),
        F.count_if("admitted").alias("admitted"),
    ).collect()[0]
    print(f"   new-batch vectors admitted vs indexed corpus: "
          f"{counts['admitted']} of {counts['total']}")
    sus = registry.QUERIES["weighted_sample_sus"](spark, sf_dir)
    print(f"   size-weighted SUS corpus draw: {sus.count()} documents")
    registry.QUERIES["contrastive_triplets"](spark, sf_dir).show(5)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
