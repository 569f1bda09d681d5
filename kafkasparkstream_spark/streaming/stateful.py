"""Custom stateful streaming operator via applyInPandasWithState.

The reference has no stateful ops beyond the windowed aggregate (SURVEY.md
§2.9: "mapGroupsWithState etc.: none"); this is the engine's extension
point for semantics the built-in operators can't express — running
per-key accumulators, custom eviction, cross-batch counters.

``running_user_totals`` keeps (event_count, value_sum) per user in the
state store and emits the updated totals for every user seen in each
micro-batch — the canonical update-mode accumulator. State is Arrow-encoded
pandas on the Python side; the state store itself (checkpointing, recovery,
partitioning by key) is Spark's.

Scale notes: state is partitioned by the group key across
``spark.sql.shuffle.partitions`` state stores, exactly like the windowed
aggregate; per-key state here is two scalars, so the store stays tiny at
any throughput. Use GroupStateTimeout when keys churn (unbounded key spaces
need eviction or the store grows forever).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
)

RUNNING_TOTALS_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_value", DoubleType(), False),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType(), False),
        StructField("s", DoubleType(), False),
    ]
)


def running_user_totals(parsed: DataFrame, key_col: str = "user_id") -> DataFrame:
    """Cross-batch running (count, sum) per key; emits current totals for
    every key present in the micro-batch (update semantics)."""

    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n, s = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            s += float(pdf["value"].fillna(0.0).sum())
        state.update((n, s))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 4)]})

    return parsed.groupBy(key_col).applyInPandasWithState(
        fn,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
