"""Custom stateful streaming operator: inactivity-gap sessionization via
``applyInPandasWithState``.

The batch engine sessionizes with a gaps-and-islands window
(queries.user_sessions); unbounded streams need per-key state instead. This
is the canonical "operator Spark lacks as a built-in" shape: per-key state
(the open session), event-time timeouts to close sessions when the
watermark passes ``session_end + gap``, and Arrow-batched pandas transfer.

State per key is one (start, end, count) triple — O(keys) memory, aged out
by the timeout, so the query runs forever at constant state size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

SESSION_OUTPUT_SCHEMA = (
    "user_id bigint, session_start timestamp, session_end timestamp, n_events bigint"
)
SESSION_STATE_SCHEMA = "start bigint, end bigint, n bigint"  # epoch micros + count


def sessionize_stream(
    rows: DataFrame,
    gap_minutes: int = 30,
    key_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str = "0 seconds",
) -> DataFrame:
    """Streaming sessionization: emits each CLOSED session once.

    A session closes either in-stream (an event for the key arrives more
    than ``gap_minutes`` after the open session's end) or by event-time
    timeout (the watermark passes end + gap with no further events).
    """
    gap_us = gap_minutes * 60 * 1_000_000

    def fn(key, pdfs: Iterator, state) -> Iterator:
        import pandas as pd

        def emit(sessions: list[tuple[int, int, int]]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "user_id": [key[0]] * len(sessions),
                    "session_start": pd.to_datetime([s[0] for s in sessions], unit="us"),
                    "session_end": pd.to_datetime([s[1] for s in sessions], unit="us"),
                    "n_events": [s[2] for s in sessions],
                }
            )

        if state.hasTimedOut:
            closed = [tuple(state.get)]
            state.remove()
            yield emit(closed)
            return

        ts: list[int] = []
        for pdf in pdfs:
            ts.extend(int(v) // 1000 for v in pdf["_evt"].astype("int64"))
        ts.sort()
        start, end, n = tuple(state.get) if state.exists else (None, None, 0)
        closed = []
        for t in ts:
            if start is None:
                start, end, n = t, t, 1
            elif t - end > gap_us:
                closed.append((start, end, n))
                start, end, n = t, t, 1
            else:
                end, n = max(end, t), n + 1
        if start is not None:
            state.update((start, end, n))
            state.setTimeoutTimestamp((end + gap_us) // 1000)  # ms epoch
        if closed:
            yield emit(closed)

    from pyspark.sql.streaming.state import GroupStateTimeout

    keyed = rows.withColumn("_evt", F.col(ts_col).cast("timestamp")).withWatermark(
        "_evt", watermark
    )
    return (
        keyed.groupBy(F.col(key_col))
        .applyInPandasWithState(
            fn,
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
