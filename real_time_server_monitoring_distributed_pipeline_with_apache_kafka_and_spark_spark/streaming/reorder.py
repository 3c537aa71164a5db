"""Watermarked reorder buffer for sequence-stateful streaming operators.

The reference's own transport can reorder deliveries: its producer sends
asynchronously with up to 5 requests in flight (reference
``producer/producer.py:17``), so per-key arrival order across micro-batches
is NOT guaranteed to match event order. The plain sequence-stateful legs
(:func:`..streaming.stateful.rolling_zscore_stream`, ``ewma_stream``) fold
rows in arrival order and would silently compute wrong values on such a
transport.

Spark disallows chaining two arbitrary ``applyInPandasWithState`` stages in
one streaming query, so the buffer cannot be a separate operator. Instead
it FUSES into the operator's keyed state:

- incoming rows park in a per-key pending buffer (columnar arrays in the
  state struct — O(delay x rate) rows per key, bounded by the watermark);
- each invocation folds-and-emits, in (event time, event id) order, exactly
  the pending rows at or below the current watermark
  (``GroupState.getCurrentWatermarkMs``) — by watermark contract no
  still-earlier row can arrive afterwards, so the fold order equals event
  order;
- an event-time timeout wakes keys that receive no further data once the
  watermark passes their earliest pending row, so buffered rows always
  drain without requiring fresh per-key traffic;
- UNLIKE aggregations, Spark does NOT filter late input for arbitrary
  stateful operators, so the buffer enforces its own guarantee: an arrival
  sorting at or before its key's emission high-water mark (the last
  (event time, id) actually folded) is dropped — folding it would violate
  event order. An arrival behind the GLOBAL watermark but still ahead of
  its key's emissions folds correctly, so this loses strictly less data
  than the windowed aggs' global-watermark drop (pinned by
  tests/test_streaming.py::test_reorder_buffer_drops_rows_later_than_hwm).

The fold cores are SHARED with the arrival-order legs and the batch
queries (``_zscore_row``; the ``alpha*x + (1-alpha)*acc`` op order), so an
out-of-order stream emits rows bitwise identical to the batch window
aggregate over the same input (pinned by tests/test_streaming.py::
test_*_stream_ordered_matches_batch_on_out_of_order_input).

At 100 TB scale: state per key = the fold core plus at most
``watermark delay x per-key event rate`` buffered rows, partitioned by key
across executors with the shuffle — the same state-size story as any
watermarked stream-stream join, and strictly smaller (three scalars per
pending row).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

from .stateful import _ewma_schemas, _zscore_row, _zscore_schemas

_BUF_FIELDS = (
    StructField("buf_event_id", ArrayType(LongType())),
    StructField("buf_ts", ArrayType(LongType())),  # event time, micros since epoch
    StructField("buf_value", ArrayType(DoubleType())),
    # Per-key emission high-water mark (ts_us, event_id of the LAST row
    # folded). Spark does NOT filter late input for arbitrary stateful
    # operators (unlike aggregations), so the buffer enforces its own
    # order guarantee: an arrival sorting at or before the high-water
    # mark would have to be folded out of order — it is dropped. An
    # arrival behind the GLOBAL watermark but still ahead of its key's
    # emissions folds correctly — strictly less data loss than the
    # aggregate operators' global-watermark drop.
    StructField("hwm_ts", LongType()),
    StructField("hwm_eid", LongType()),
)


def _ts_micros(ts: pd.Series) -> list[int]:
    s = ts
    if getattr(s.dtype, "tz", None) is not None:
        s = s.dt.tz_convert("UTC").dt.tz_localize(None)
    return [int(x) for x in s.astype("datetime64[us]").astype("int64")]


_UTC_NAMES = {"UTC", "Etc/UTC", "GMT", "Z", "+00:00"}


def _require_utc_session(df: DataFrame) -> None:
    """The buffer compares event-time micros (delivered to Python as
    SESSION-timezone-naive wall clock) against ``getCurrentWatermarkMs``
    (epoch UTC). Those agree iff the session time zone is UTC — the
    engine's session policy (session.py) pins it, but a caller wiring
    these operators into their own session must not silently get
    watermark logic offset by their zone: fail loudly at build time."""
    tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
    if tz not in _UTC_NAMES:
        raise ValueError(
            "reorder-buffer streaming operators require "
            f"spark.sql.session.timeZone=UTC (got {tz!r}): event-time "
            "micros are session-zone wall clock while the watermark is "
            "epoch UTC, so any other zone mis-folds or stalls emission"
        )


def _buffered_fn(
    n_core: int,
    init_core: Callable[[], list],
    fold: Callable[[list, list[tuple[int, int, float]], Any], tuple[list, list]],
    out_names: list[str],
):
    """Build the applyInPandasWithState function: state = ``n_core`` fold
    fields followed by the three pending-buffer arrays; ``fold(core,
    ready_rows, key)`` consumes watermark-ready (event_id, ts_us, value)
    tuples in event order and returns (out_rows, new_core)."""

    def fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            st = state.get
            core = list(st[:n_core])
            buf = [list(x) if x is not None else [] for x in st[n_core : n_core + 3]]
            hwm = (
                st[n_core + 3] if st[n_core + 3] is not None else -(1 << 62),
                st[n_core + 4] if st[n_core + 4] is not None else -(1 << 62),
            )
        else:
            core, buf, hwm = init_core(), [[], [], []], (-(1 << 62), -(1 << 62))
        for pdf in pdfs:
            if not len(pdf):
                continue
            for eid, ts_us, v in zip(
                (int(x) for x in pdf["event_id"]),
                _ts_micros(pdf["ts"]),
                (float(x) for x in pdf["value"]),
            ):
                # Too late: this key already emitted at or past (ts, id).
                if (ts_us, eid) <= hwm:
                    continue
                buf[0].append(eid)
                buf[1].append(ts_us)
                buf[2].append(v)
        wm_ms = state.getCurrentWatermarkMs()
        pending = sorted(zip(buf[0], buf[1], buf[2]), key=lambda r: (r[1], r[0]))
        ready = [r for r in pending if r[1] <= wm_ms * 1000]
        rest = [r for r in pending if r[1] > wm_ms * 1000]
        out_rows, core = fold(core, ready, key[0])
        if ready:
            hwm = (ready[-1][1], ready[-1][0])
        state.update(
            tuple(core)
            + (
                [r[0] for r in rest],
                [r[1] for r in rest],
                [r[2] for r in rest],
                hwm[0],
                hwm[1],
            )
        )
        if rest:
            # Wake this key once the watermark passes its earliest pending
            # row, even if no further data arrives for it. Must be strictly
            # beyond the current watermark or Spark rejects it.
            state.setTimeoutTimestamp(max(rest[0][1] // 1000, wm_ms + 1))
        if out_rows:
            yield pd.DataFrame(out_rows, columns=out_names)

    return fn


def _zscore_fold(window: int):
    def fold(core, ready, user_id):
        hist = list(core[0]) if core[0] is not None else []
        rows = []
        for eid, ts_us, v in ready:
            n, z = _zscore_row(v, hist)
            rows.append(
                (
                    eid,
                    user_id,
                    pd.Timestamp(ts_us, unit="us"),
                    v,
                    n,
                    z,
                    None if z is None else abs(z) > 3.0,
                )
            )
            hist.append(v)
            if len(hist) > window:
                del hist[: len(hist) - window]
        return rows, [hist]

    return fold


def rolling_zscore_stream_ordered(
    events: DataFrame, window: int = 12, delay: str = "2 hours"
) -> DataFrame:
    """Out-of-order-safe twin of ``stateful.rolling_zscore_stream``: the
    same trailing-window z-score fold (shared :func:`_zscore_row` core,
    bitwise-identical to the batch ``monitor_anomaly_zscore``), preceded
    by the fused watermarked reorder buffer. Applies
    ``withWatermark("ts", delay)`` itself — ``delay`` is the reorder
    tolerance; arrivals the key has already emitted past are dropped (see
    the module docstring's high-water-mark contract). Emission lags
    arrival by the watermark (a row emits once no earlier row can still
    arrive), the price of correctness on a reordering transport.
    """
    _require_utc_session(events)
    out_schema, _ = _zscore_schemas(window)
    state_schema = StructType(
        [StructField("window", ArrayType(DoubleType())), *_BUF_FIELDS]
    )
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _buffered_fn(1, lambda: [[]], _zscore_fold(window), [f.name for f in out_schema]),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _ewma_fold(alpha: float):
    def fold(core, ready, user_id):
        started = bool(core[0]) if core[0] is not None else False
        ewma = float(core[1]) if core[1] is not None else 0.0
        rows = []
        for eid, ts_us, v in ready:
            # Same op order as the batch fold so floats agree bitwise.
            ewma = (alpha * v + (1.0 - alpha) * ewma) if started else v
            started = True
            rows.append((eid, user_id, pd.Timestamp(ts_us, unit="us"), v, ewma))
        return rows, [started, ewma]

    return fold


def ewma_stream_ordered(
    events: DataFrame, alpha: float = 0.2, delay: str = "2 hours"
) -> DataFrame:
    """Out-of-order-safe twin of ``stateful.ewma_stream``: the same scalar
    EWMA recursion behind the fused watermarked reorder buffer. See
    :func:`rolling_zscore_stream_ordered` for the buffer contract.
    """
    _require_utc_session(events)
    out_schema, _ = _ewma_schemas()
    state_schema = StructType(
        [
            StructField("started", BooleanType()),
            StructField("ewma", DoubleType()),
            *_BUF_FIELDS,
        ]
    )
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _buffered_fn(2, lambda: [False, 0.0], _ewma_fold(alpha), [f.name for f in out_schema]),
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_RATE_SPIKE_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("prev_value", DoubleType()),
        StructField("delta_us", LongType()),
        StructField("rate_per_s", DoubleType()),
    ]
)


def _rate_spike_fold(threshold: float):
    import math

    def fold(core, ready, user_id):
        prev_ts = int(core[0]) if core[0] is not None else None
        prev_v = float(core[1]) if core[1] is not None else None
        rows = []
        for eid, ts_us, v in ready:
            if prev_ts is not None:
                delta_us = ts_us - prev_ts
                if delta_us != 0:
                    # Same IEEE op sequence as the batch query's
                    # (value - prev) / (delta_us / 1e6) + display_round(9),
                    # so emitted doubles agree bitwise.
                    rate = (v - prev_v) / (delta_us / 1e6)
                    r9 = math.floor(rate * 1e9 + 0.5) / 1e9
                    if abs(r9) > threshold:
                        rows.append(
                            (
                                user_id,
                                eid,
                                pd.Timestamp(ts_us, unit="us"),
                                v,
                                prev_v,
                                delta_us,
                                r9,
                            )
                        )
            prev_ts, prev_v = ts_us, v
        return rows, [prev_ts, prev_v]

    return fold


def rate_spike_stream_ordered(
    events: DataFrame, threshold: float = 0.1, delay: str = "2 hours"
) -> DataFrame:
    """Out-of-order-safe streaming twin of the batch
    ``monitor_rate_spike`` query: per-key first-derivative spike
    detection behind the fused watermarked reorder buffer. The fold
    state is just the previous (ts, value) pair — the smallest possible
    sequence-stateful core — but it is exactly as order-sensitive as the
    z-score window (a swapped arrival pair inverts the derivative's
    sign), so it gets the same buffer treatment. Emits ONLY spike rows
    (|9-dec rounded rate| > threshold), matching the batch filter; rows
    are bitwise identical to the batch lag-window query on the same
    input (pinned by tests/test_streaming.py::
    test_rate_spike_stream_ordered_matches_batch_on_out_of_order_input).
    """
    _require_utc_session(events)
    state_schema = StructType(
        [
            StructField("prev_ts_us", LongType()),
            StructField("prev_value", DoubleType()),
            *_BUF_FIELDS,
        ]
    )
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _buffered_fn(
                2,
                lambda: [None, None],
                _rate_spike_fold(threshold),
                [f.name for f in _RATE_SPIKE_SCHEMA],
            ),
            outputStructType=_RATE_SPIKE_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


_CUSUM_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("value", DoubleType()),
        StructField("cusum_hi", DoubleType()),
        StructField("cusum_lo", DoubleType()),
        StructField("shifted", BooleanType()),
    ]
)


def _cusum_fold(mu: float, k: float, h: float):
    def fold(core, ready, user_id):
        s_hi = float(core[0]) if core[0] is not None else 0.0
        s_lo = float(core[1]) if core[1] is not None else 0.0
        rows = []
        for eid, ts_us, v in ready:
            # Same IEEE op sequence as the batch fold (greatest(0, acc +
            # drift)), so the running accumulators agree bitwise with a
            # batch replay at the same fixed target.
            s_hi = max(0.0, s_hi + (v - mu - k))
            s_lo = max(0.0, s_lo + (mu - k - v))
            rows.append(
                (
                    user_id,
                    eid,
                    pd.Timestamp(ts_us, unit="us"),
                    v,
                    s_hi,
                    s_lo,
                    s_hi > h or s_lo > h,
                )
            )
        return rows, [s_hi, s_lo]

    return fold


def cusum_stream_ordered(
    events: DataFrame,
    mu: float,
    k: float = 25.0,
    h: float = 200.0,
    delay: str = "2 hours",
) -> DataFrame:
    """Out-of-order-safe streaming CUSUM: the two-sided level-shift fold
    of the batch ``monitor_cusum_shift`` query behind the fused
    watermarked reorder buffer, with TWO scalars of per-key state
    (s_hi, s_lo) — the smallest stateful core after rate-spike's.

    One deliberate difference from the batch query: the target ``mu`` is
    a FIXED parameter, not the key's own full-history mean — a streaming
    monitor cannot know the final mean in advance, and production CUSUM
    runs against a control-period target anyway (that is what makes the
    alarm meaningful). Given the same target, the emitted running
    accumulators are bitwise identical to a batch replay of the fold
    over the same events (pinned by tests/test_streaming.py::
    test_cusum_stream_ordered_matches_batch_on_out_of_order_input).
    Order-sensitivity: the running path (and therefore WHEN the alarm
    first fires) depends on event order, so out-of-order transports get
    the same buffer treatment as z-score/EWMA/rate-spike.
    """
    _require_utc_session(events)
    state_schema = StructType(
        [
            StructField("s_hi", DoubleType()),
            StructField("s_lo", DoubleType()),
            *_BUF_FIELDS,
        ]
    )
    return (
        events.withWatermark("ts", delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            _buffered_fn(
                2,
                lambda: [0.0, 0.0],
                _cusum_fold(mu, k, h),
                [f.name for f in _CUSUM_SCHEMA],
            ),
            outputStructType=_CUSUM_SCHEMA,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
