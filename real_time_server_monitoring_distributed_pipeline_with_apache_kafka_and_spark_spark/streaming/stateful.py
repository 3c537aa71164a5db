"""Custom stateful streaming operators (SURVEY.md SS2.7 T5 surface).

The reference has no stateful processing beyond windowed aggregation; this
adds the monitoring primitive its alert stream actually needs downstream:
**alert transition tracking with flap debouncing** — emit one event when an
entity's alert state *changes* and has stayed changed for ``debounce``
consecutive windows, instead of re-emitting "CPU spike suspected" for every
10-second window of a 2-hour incident.

Implemented with ``applyInPandasWithState`` (Arrow-batched, partitioned by
entity — state lives with the shuffle partition, scales horizontally with
executors; the per-group state is three scalars, so state size is
O(entities), not O(windows)).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSITION_SCHEMA = StructType(
    [
        StructField("server_id", StringType()),
        StructField("window_start", TimestampType()),
        StructField("from_state", StringType()),
        StructField("to_state", StringType()),
    ]
)

_STATE_SCHEMA = StructType(
    [
        StructField("current", StringType()),
        StructField("pending", StringType()),
        StructField("pending_count", IntegerType()),
    ]
)


def _transition_fn(debounce: int):
    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        current, pending, pending_count = (
            state.get if state.exists else (None, None, 0)
        )
        out_rows = []
        for pdf in pdfs:
            # micro-batch rows arrive unordered; process in window order
            pdf = pdf.sort_values("window_start")
            for row in pdf.itertuples(index=False):
                alert = row.alert
                if alert == current:
                    pending, pending_count = None, 0
                    continue
                if alert == pending:
                    pending_count += 1
                else:
                    pending, pending_count = alert, 1
                if pending_count >= debounce:
                    out_rows.append((key[0], row.window_start, current, alert))
                    current, pending, pending_count = alert, None, 0
        state.update((current, pending, pending_count))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=[f.name for f in TRANSITION_SCHEMA])

    return fn


def track_alert_transitions(
    alerts: DataFrame, entity_col: str = "server_id", debounce: int = 2
) -> DataFrame:
    """Debounced alert state transitions per entity.

    ``alerts`` is a *streaming* DataFrame with (entity, window_start,
    alert) — e.g. the output of the windowed alert jobs. A transition is
    emitted once the new alert value has held for ``debounce`` consecutive
    observed windows; flaps shorter than that are suppressed. ``from_state``
    is NULL for an entity's first established state.
    """
    return alerts.groupBy(entity_col).applyInPandasWithState(
        _transition_fn(debounce),
        outputStructType=TRANSITION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
