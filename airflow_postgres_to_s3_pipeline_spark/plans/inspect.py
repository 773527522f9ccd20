"""Physical-plan inspection helpers.

Used by tests to assert the plans we *want* at 100 TB, not just correct
results: filters pushed to the parquet scan, dimension joins broadcast,
expressions inside whole-stage codegen.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(  # type: ignore[attr-defined]
        df._jdf.queryExecution(), mode
    )


def unpartitioned_windows(df: DataFrame) -> list[str]:
    """Window nodes in the optimized logical plan whose PARTITION BY is
    empty — each becomes a ``WindowExec: No Partition Defined`` single-
    partition sort at runtime, i.e. the whole input serializes through
    one task.  Fine over a provably bounded frame (a <=100-row bucket
    table), fatal over a corpus; tests/test_plan_lint.py whitelists the
    bounded sites and fails everything else (r11 verdict task 3).

    Walks the logical plan via py4j (class name ``Window`` +
    ``partitionSpec().isEmpty()``) rather than regexing the plan string:
    window expression text contains nested brackets that defeat a
    bracket-group parse, and the logical node maps 1:1 onto WindowExec.
    The walk also descends into ``node.subqueries()`` (plans nested in
    ScalarSubquery/Exists/In expressions) — children() alone leaves a
    corpus-sized unpartitioned window hidden inside a subquery invisible
    to the lint (r12 ADVICE).  Returns one ``simpleString`` per
    offending node for the assertion message."""
    out: list[str] = []

    def walk(node) -> None:
        if (node.getClass().getSimpleName() == "Window"
                and node.partitionSpec().isEmpty()):
            out.append(node.simpleString(120))
        for i in range(node.children().size()):
            walk(node.children().apply(i))
        subs = node.subqueries()
        for i in range(subs.size()):
            walk(subs.apply(i))

    walk(df._jdf.queryExecution().optimizedPlan())
    return out


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from the formatted plan (parquet pushdown),
    one string per scan.  Matches to the LAST ``]`` on the line, not the
    first (r10 review): an In-list pushdown prints nested brackets —
    ``PushedFilters: [In(a, [1, 2]), IsNotNull(b)]`` — and the old
    ``[^\\]]*`` regex cut it mid-entry, dropping every filter after the
    In and silently weakening the plan-shape assertions built on this."""
    text = explain_str(df)
    return [
        m.group(1)
        for line in text.splitlines()
        if (m := re.search(r"PushedFilters: \[(.*)\]\s*$", line))
    ]


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the plan (wider = fewer breaks)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df, "simple"))))


def executed_scan_metrics(df: DataFrame) -> list[dict]:
    """Execute ``df`` and return the runtime metrics of every file-scan
    leaf in its physical plan — the read-side proof that a layout skips.

    Plan-shape checks (``pushed_filters``) show a predicate *reached* the
    scan; this shows what the scan then *did*: with min/max-clustered
    files (write_sorted_layout / write_zorder_layout) the parquet reader
    drops whole row groups whose statistics exclude the predicate, so the
    scan's ``numOutputRows`` lands far below the table's row count.  On a
    random layout every row group straddles the full key domain and the
    same query's scan emits every row.

    Returns one dict per scan leaf with whichever of numFiles /
    filesSize / numOutputRows / metadataTime the Spark version exposes.
    Uses the executed plan's SQLMetric values (the same numbers the Spark
    UI shows), unwrapping AdaptiveSparkPlanExec when AQE replanned.

    The plan is executed JVM-side (``execute().count()`` on the physical
    root): metrics accumulate exactly as under any action, but no row is
    ever serialized to the driver — this helper stays safe to point at a
    full-size table.  Because the probe bypasses
    ``SQLExecution.withNewExecutionId``, the run is INVISIBLE in the
    Spark UI's SQL tab (it appears only as anonymous jobs) — it is a
    diagnostic, not a substitute for running the query.

    Reaches into Catalyst internals via Py4J (``executedPlan`` /
    ``collectLeaves`` / per-node ``metrics``), which are not a stable
    API; any failure is re-raised as RuntimeError naming the probe so a
    Spark upgrade surfaces as a clear message instead of a raw Py4JError.
    """
    try:
        plan = df._jdf.queryExecution().executedPlan()  # type: ignore[attr-defined]
        plan.execute().count()
        if plan.getClass().getSimpleName() == "AdaptiveSparkPlanExec":
            plan = plan.executedPlan()
        leaves = plan.collectLeaves()
        out: list[dict] = []
        for i in range(leaves.size()):
            node = leaves.apply(i)
            name = node.getClass().getSimpleName()
            if "Scan" not in name:
                continue
            metrics = node.metrics()
            entry: dict = {"node": name}
            for key in ("numFiles", "filesSize", "numOutputRows", "metadataTime"):
                if metrics.contains(key):
                    entry[key] = metrics.apply(key).value()
            out.append(entry)
        return out
    except Exception as exc:  # Py4JError / AttributeError on plan drift
        raise RuntimeError(
            "executed_scan_metrics: unsupported Spark plan shape or "
            "version — the probe depends on internal executedPlan/"
            f"collectLeaves/metrics APIs ({type(exc).__name__}: {exc})"
        ) from exc
