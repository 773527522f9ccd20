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


def pushed_filters(df: DataFrame) -> list[str]:
    """PushedFilters entries from the formatted plan (parquet pushdown)."""
    text = explain_str(df)
    return re.findall(r"PushedFilters: \[([^\]]*)\]", text)


def has_broadcast_join(df: DataFrame) -> bool:
    return "BroadcastHashJoin" in explain_str(df, "simple")


def wholestage_codegen_spans(df: DataFrame) -> int:
    """Number of WholeStageCodegen spans in the plan (wider = fewer breaks)."""
    return len(set(re.findall(r"WholeStageCodegen \((\d+)\)", explain_str(df, "simple"))))
