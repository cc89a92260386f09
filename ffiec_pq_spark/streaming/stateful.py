"""Custom stateful streaming operator: gap-based sessionization with
``applyInPandasWithState`` (Arrow-batched per-key state machine).

``session_window`` aggregation covers plain gap sessions; this operator
is the template for session payloads Spark's built-in aggregation can't
express (custom per-session reductions, early emission policies,
ML-feature state).  Semantics match the batch ``sessionize``
(operators/windows.py): a session closes when the gap to the next event
of the same key exceeds ``gap_minutes``.

State machine per user key:
- incoming rows merge with the open session (if any) and split on gaps;
  every session closed *within* the batch emits immediately;
- the still-open tail session is stored in state with an event-time
  timeout at ``session_end + gap``; when the watermark passes it, the
  timeout fires and the session emits (exactly-once, late-data-safe).

Scale: state is O(active keys) x a 4-field tuple; the watermark bounds
it — every idle key times out and is removed.  One shuffle on the key
per micro-batch, identical to the batch plan.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUT_SCHEMA = (
    "user_id long, session_start timestamp, session_end timestamp, "
    "n_events long, total_value double"
)
STATE_SCHEMA = "start_us long, end_us long, n long, total double"

_US_PER_MIN = 60 * 1_000_000


def _session_row(user_id: int, s: Tuple[int, int, int, float]) -> pd.DataFrame:
    start_us, end_us, n, total = s
    return pd.DataFrame(
        {
            "user_id": [user_id],
            "session_start": [pd.Timestamp(start_us, unit="us")],
            "session_end": [pd.Timestamp(end_us, unit="us")],
            "n_events": [n],
            "total_value": [total],
        }
    )


def sessionize_stream(
    events: DataFrame,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
    ts_col: str = "ts",
    key_col: str = "user_id",
    value_col: str = "value",
) -> DataFrame:
    """Streaming gap-sessionizer returning one row per closed session."""
    gap_us = gap_minutes * _US_PER_MIN

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = key[0]
        if state.hasTimedOut:
            open_sess = state.get
            state.remove()
            yield _session_row(user_id, tuple(open_sess))
            return

        wm_us = state.getCurrentWatermarkMs() * 1000
        batches = [pdf for pdf in pdfs if len(pdf)]
        events_us: list[tuple[int, float]] = []
        for pdf in batches:
            ts_us = pdf[ts_col].values.astype("datetime64[us]").astype("int64")
            vals = pdf[value_col].astype("float64").values
            # drop rows later than the watermark: Spark does not filter
            # input to custom stateful ops, and merging an hours-late
            # event into the open (much newer) session would corrupt it
            events_us.extend(
                (t, v) for t, v in zip(ts_us.tolist(), vals.tolist()) if t >= wm_us
            )
        events_us.sort()

        open_sess = list(state.get) if state.exists else None
        closed: list[tuple[int, int, int, float]] = []
        for t, v in events_us:
            if open_sess is None:
                open_sess = [t, t, 0, 0.0]
            elif t - open_sess[1] > gap_us:
                closed.append(tuple(open_sess))
                open_sess = [t, t, 0, 0.0]
            open_sess[1] = max(open_sess[1], t)
            open_sess[2] += 1
            open_sess[3] += v

        if open_sess is not None and open_sess[1] + gap_us <= wm_us:
            # already un-extendable under the watermark: close now rather
            # than set a timeout in the past (which Spark rejects)
            closed.append(tuple(open_sess))
            open_sess = None

        if open_sess is not None:
            state.update(tuple(open_sess))
            state.setTimeoutTimestamp((open_sess[1] + gap_us) // 1000)
        elif state.exists:
            state.remove()

        for s in closed:
            yield _session_row(user_id, s)

    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            fn,
            outputStructType=OUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
