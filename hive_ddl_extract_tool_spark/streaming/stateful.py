"""Custom stateful streaming operator (SURVEY.md §2B X14/X15):
per-key running aggregation via ``applyInPandasWithState``.

This is the extension point for operators Structured Streaming lacks as
built-ins (custom sessionization, decaying counters, online sketches). State
is a per-key blob the engine shuffles/persists in the state store; the
function sees Arrow batches per key per micro-batch -- the same execution
shape at any cluster size.
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("n_events", LongType()),
    StructField("total_value", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n", LongType()),
    StructField("total", DoubleType()),
])


def _update_totals(
    key: tuple, batches: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold each micro-batch into (count, sum) state; emit the running totals
    once per batch in which the key appears."""
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in batches:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "total_value": [total]})


def running_user_totals(events_stream: DataFrame) -> DataFrame:
    """Streaming DataFrame of per-user running (count, sum(value)) --
    emits an updated row for every user seen in each micro-batch."""
    return (
        events_stream.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
