"""Plan-shape assertions: the 100 TB design rules, checked on real plans.

Correct results with the wrong plan is a latent scale bug — these tests pin
the physical properties we rely on: filter pushdown to the parquet scan,
column pruning, broadcast joins for dims, no cartesian products in the
banded LSH join.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from airflow_postgres_to_s3_pipeline_spark.catalog import table
from airflow_postgres_to_s3_pipeline_spark.operators import relational, similarity
from airflow_postgres_to_s3_pipeline_spark.plans import (
    explain_str,
    has_broadcast_join,
    pushed_filters,
)


def test_filter_pushdown_reaches_scan(spark, sf_dir):
    df = relational.export_projection_filter(spark, sf_dir)
    filters = " ".join(pushed_filters(df))
    assert "o_orderstatus" in filters, f"pushdown missing: {filters}"


def test_pushed_filters_survive_in_list_brackets(spark, sf_dir):
    """An In-list pushdown prints nested brackets in the plan line —
    PushedFilters: [In(o_orderstatus, [F, O]), IsNotNull(...)] — and the
    pre-r10 regex stopped at the first ']', mangling the In entry and
    dropping every filter after it.  Both the full In-list and a filter
    AFTER it must survive parsing."""
    from pyspark.sql import functions as F

    df = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderstatus").isin("F", "O"))
        .filter(F.col("o_custkey") > 100)
        .select("o_orderkey")
    )
    filters = " ".join(pushed_filters(df))
    assert "In(o_orderstatus, [F,O])" in filters.replace(", [F, O]", ", [F,O]"), (
        f"In-list entry truncated: {filters}"
    )
    assert "o_custkey" in filters, f"filter after the In-list lost: {filters}"


def test_column_pruning(spark, sf_dir):
    df = table(spark, sf_dir, "lineitem").select("l_orderkey")
    plan = explain_str(df)
    # ReadSchema must not include unprojected columns
    assert "l_extendedprice" not in plan.split("ReadSchema")[1].splitlines()[0]


def test_dimension_joins_broadcast(spark, sf_dir):
    assert has_broadcast_join(relational.join_broadcast_dims(spark, sf_dir))


def test_knn_broadcasts_queries(spark, sf_dir):
    plan = explain_str(similarity.knn_bruteforce(spark, sf_dir), "simple")
    assert "Broadcast" in plan


def test_no_collect_in_operator_paths():
    """Design rule: no driver materialization inside operators (the
    reference's fetchall anti-pattern, SURVEY.md Q3)."""
    import pathlib

    root = pathlib.Path(__file__).resolve().parents[1] / (
        "airflow_postgres_to_s3_pipeline_spark"
    )
    offenders = []
    for p in root.rglob("*.py"):
        src = p.read_text()
        if ".collect()" in src or ".toPandas()" in src:
            offenders.append(p.name)
    assert not offenders, f"driver materialization in: {offenders}"


def test_aqe_and_dynamic_overwrite_defaults(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode").lower()
        == "dynamic"
    )


def test_semantic_dedup_broadcasts_centroids(spark, sf_dir):
    """Cluster assignment must be a broadcast argmin — the corpus never
    shuffles for it; only the within-cluster pair join repartitions."""
    from airflow_postgres_to_s3_pipeline_spark.operators import similarity as sim

    plan = explain_str(sim.semantic_dedup(spark, sf_dir), "simple")
    assert "Broadcast" in plan
    assert "CartesianProduct" not in plan


def test_min_cost_supplier_broadcasts_dims(spark, sf_dir):
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    assert has_broadcast_join(advanced.min_cost_supplier(spark, sf_dir))


def test_large_volume_orders_aggregates_before_join(spark, sf_dir):
    """The having-aggregate must sit BELOW the order/customer joins in the
    plan (join sees qualifying keys only, not the fact table)."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    plan = explain_str(advanced.large_volume_orders(spark, sf_dir), "simple")
    agg_pos = plan.find("sum_qty")
    assert agg_pos != -1 and "CartesianProduct" not in plan
    assert has_broadcast_join(advanced.large_volume_orders(spark, sf_dir))


def test_hypertable_rollup_reuses_hourly_partials(spark, sf_dir):
    """The daily tier must reference the persisted hourly frame (InMemory
    relation in the plan), not a second scan of events."""
    from airflow_postgres_to_s3_pipeline_spark.operators import windows

    plan = explain_str(windows.hypertable_rollup(spark, sf_dir), "simple")
    # both union branches must read the cached hourly frame (the cached
    # relation's description embeds its build plan, so counting FileScan
    # strings would double-count — count the cache reads instead)
    assert plan.count("InMemoryTableScan") == 2, plan


def test_nation_volume_shipping_broadcasts_both_nation_roles(spark, sf_dir):
    """Q7 shape: supplier + both nation aliases broadcast — the fact scan
    exchanges only for the orderkey and custkey joins."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    df = advanced.nation_volume_shipping(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    filters = " ".join(pushed_filters(df))
    assert "l_shipdate" in filters, f"date pushdown missing: {filters}"


def test_returned_item_revenue_topn_no_full_sort(spark, sf_dir):
    """Q10 shape: the global top-N must be TakeOrderedAndProject (per-
    partition heaps), never a full Sort+Limit materialization."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    plan = explain_str(advanced.returned_item_revenue(spark, sf_dir), "simple")
    assert "TakeOrderedAndProject" in plan, plan


def test_disjunctive_filter_pushdown(spark, sf_dir):
    """Q19 shape: the OR-of-conjunctions must reach the part scan as a
    pushed filter (Catalyst keeps Or predicates pushable per-relation)."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    df = advanced.disjunctive_filter_parts(spark, sf_dir)
    filters = " ".join(pushed_filters(df))
    assert "p_brand" in filters or "Or" in filters, f"no pushdown: {filters}"
    assert has_broadcast_join(df)


def test_inactive_customers_anti_join(spark, sf_dir):
    """Q22 shape: NOT EXISTS must plan as LeftAnti with the 1-row threshold
    broadcast."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    plan = explain_str(
        advanced.inactive_high_value_customers(spark, sf_dir), "simple"
    )
    assert "LeftAnti" in plan, plan
    assert "Broadcast" in plan


def test_local_supplier_volume_broadcast_dims(spark, sf_dir):
    """Q5 shape: supplier/nation/region broadcast; the fact side exchanges
    only for the orderkey and custkey joins, and the region filter prunes
    the nation dim before it reaches the fact."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    df = advanced.local_supplier_volume(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert plan.count("BroadcastHashJoin") >= 3, plan
    filters = " ".join(pushed_filters(df))
    assert "r_name" in filters, f"region pushdown missing: {filters}"
    assert "o_orderdate" in filters, f"date pushdown missing: {filters}"


def test_nation_market_share_single_agg_no_reshuffle(spark, sf_dir):
    """Q8 shape: the conditional share-of-volume computes BOTH sums in ONE
    aggregate over the star join — no second shuffle or self-join of the
    fact to separate target-nation volume from total volume."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    df = advanced.nation_market_share(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert plan.count("BroadcastHashJoin") >= 4, plan
    # one partial+final aggregate pair, not two independent agg pipelines
    assert plan.count("HashAggregate") == 2, plan


def test_top_supplier_revenue_max_is_broadcast_not_collect(spark, sf_dir):
    """Q15 shape: the max-revenue threshold joins as a broadcast of the
    1-row max frame — no driver-side collect of the aggregate."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    df = advanced.top_supplier_revenue(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    filters = " ".join(pushed_filters(df))
    assert "l_shipdate" in filters, f"date pushdown missing: {filters}"


def test_small_quantity_revenue_broadcasts_part_slice(spark, sf_dir):
    """Q17 shape: the brand-filtered part slice and the per-part stats are
    both broadcast — the lineitem fact never shuffles on partkey."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    df = advanced.small_quantity_revenue(spark, sf_dir)
    plan = explain_str(df, "simple")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    filters = " ".join(pushed_filters(df))
    assert "p_brand" in filters, f"brand pushdown missing: {filters}"


def test_runtime_bloom_filter_injects_on_shuffle_join(spark, sf_dir):
    """At 100 TB a selective dim filter should prune the fact scan even
    when the dim outgrows broadcast: Spark's runtime bloom-filter
    (InjectRuntimeFilter) builds bloom_filter_agg on the filtered creation
    side and applies might_contain on the fact side.  Locally every dim
    broadcasts (where DPP/broadcast pruning covers it), so this pins the
    at-scale shape by disabling broadcast for one plan."""
    from pyspark.sql import functions as F

    from airflow_postgres_to_s3_pipeline_spark.catalog import table

    old_thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    old_scan = spark.conf.get(
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold"
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            "0",
        )
        l = table(spark, sf_dir, "lineitem")
        o = table(spark, sf_dir, "orders").filter(
            F.col("o_totalprice") > 400000
        ).select("o_orderkey")
        j = l.join(o, l.l_orderkey == o.o_orderkey)
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan[:2000]
        assert "might_contain" in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old_thresh)
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold",
            old_scan,
        )


def test_zorder_readback_pushes_both_dimensions(spark, sf_dir):
    """The r5 Z-order round-trip entry: the read-back scan must push BOTH
    interleaved-key predicates to the parquet reader (row-group pruning
    against the narrow per-file min/max the layout produced) and prune to
    the projected columns."""
    from airflow_postgres_to_s3_pipeline_spark.operators import layout

    df = layout.zorder_scan_roundtrip(spark, sf_dir)
    filters = " ".join(pushed_filters(df))
    assert "l_orderkey" in filters and "l_partkey" in filters, filters
    plan = explain_str(df)
    read_schema = plan.split("ReadSchema")[1].splitlines()[0]
    assert "l_quantity" in read_schema


# ---------------------------------------------------------------------------
# Session-3 operators: plan properties at a glance
# ---------------------------------------------------------------------------

def test_funnel_pushes_event_type_filters_to_scan(spark, sf_dir):
    """Each funnel step scans events with its event_type predicate pushed
    to parquet (row-group pruning at scale) — three narrow scans, never one
    wide scan re-filtered in memory."""
    from airflow_postgres_to_s3_pipeline_spark.operators import windows as w

    df = w.funnel_ordered_3step(spark, sf_dir)
    filters = " ".join(pushed_filters(df))
    assert "event_type" in filters, f"pushdown missing: {filters}"


def test_dq_audit_fk_checks_are_anti_joins(spark, sf_dir):
    """Referential checks must plan as LeftAnti hash joins (broadcast or
    shuffled), never as NOT IN subquery BNLJ shapes."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    plan = explain_str(advanced.dq_audit(spark, sf_dir), "simple")
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_fuzzy_match_blocking_is_equi_join(spark, sf_dir):
    """Both blocking passes must be hash equi-joins on the token key; the
    levenshtein threshold is a post-join row-local Filter, not a join
    condition that would force a nested-loop."""
    from airflow_postgres_to_s3_pipeline_spark.operators import entity

    plan = explain_str(entity.fuzzy_match_parts(spark, sf_dir), "simple")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "levenshtein" in plan.lower()


def test_scd2_is_single_pass_union(spark, sf_dir):
    """SCD2 apply: one join of dim x changes feeding both union branches —
    no window over the dimension, no cartesian."""
    from airflow_postgres_to_s3_pipeline_spark.operators import advanced

    plan = explain_str(advanced.scd2_apply(spark, sf_dir), "simple")
    assert "Window" not in plan
    assert "CartesianProduct" not in plan


def test_triangle_closure_is_hash_joins(spark, sf_dir):
    from airflow_postgres_to_s3_pipeline_spark.operators import graph

    plan = explain_str(graph.triangle_count(spark, sf_dir), "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_triangle_orientations_bit_identical(spark, sf_dir):
    """Degree orientation (the skew-safe default) must produce the same
    per-part counts as id orientation — triangle membership is
    orientation-invariant."""
    from airflow_postgres_to_s3_pipeline_spark.operators import graph

    a = {
        (r.l_partkey, r.n_triangles)
        for r in graph.triangle_count(spark, sf_dir, orient="degree").collect()
    }
    b = {
        (r.l_partkey, r.n_triangles)
        for r in graph.triangle_count(spark, sf_dir, orient="id").collect()
    }
    assert a and a == b


def test_stratified_k_sampling_gets_window_group_limit(spark, sf_dir):
    """rn <= K over a ranked window must trigger WindowGroupLimit (top-K
    pushdown: partial limit before the shuffle, final after) — without it
    every stratum's full contents sort through the window at scale."""
    from airflow_postgres_to_s3_pipeline_spark.operators import curation

    plan = explain_str(
        curation.stratified_sample_k_per_group(spark, sf_dir), "simple"
    )
    assert "WindowGroupLimit" in plan


def test_parquet_aggregate_pushdown_answers_from_footers(spark, sf_dir):
    """MIN/MAX/COUNT with no filter can be answered from parquet footer
    statistics alone (DSv2 + spark.sql.parquet.aggregatePushdown): the
    scan's ReadSchema becomes the aggregate results, not the column — at
    100 TB that is the difference between reading footers and reading
    600 TB of pages.  Values must equal the DSv1 full-scan aggregate."""
    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.parquet.aggregatePushdown",
            "spark.sql.sources.useV1SourceList",
        )
    }
    try:
        spark.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        spark.conf.set("spark.sql.sources.useV1SourceList", "")
        df = (
            spark.read.format("parquet")
            .load(f"{sf_dir}/lineitem.parquet")
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.min("l_quantity").alias("qmin"),
                F.max("l_quantity").alias("qmax"),
            )
        )
        row = df.collect()[0]
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "PushedAggregation: [COUNT(*), MIN(l_quantity), MAX(l_quantity)]" in plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    base = (
        spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("l_quantity").alias("qmin"),
            F.max("l_quantity").alias("qmax"),
        )
        .collect()[0]
    )
    assert (row.n, row.qmin, row.qmax) == (base.n, base.qmin, base.qmax)


def test_nested_schema_pruning_reads_only_the_subfield(spark, tmp_path):
    """Selecting one struct subfield must prune the ReadSchema to that leaf
    — on wide nested telemetry (the multimodal metadata shape) reading the
    whole struct for one field is a silent multi-x scan cost."""
    path = str(tmp_path / "nested")
    spark.sql(
        "SELECT id, named_struct('a', id + 1, 'b', repeat('x', 100), "
        "'c', id * 2) AS payload FROM range(1000)"
    ).write.mode("overwrite").parquet(path)
    df = spark.read.parquet(path).select(F.col("payload.a").alias("a"))
    plan = explain_str(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0].strip()
    assert read_schema == "struct<payload:struct<a:bigint>>", read_schema
    assert df.agg(F.sum("a")).collect()[0][0] == sum(i + 1 for i in range(1000))
