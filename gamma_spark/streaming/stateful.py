"""Custom stateful streaming operators via ``applyInPandasWithState``.

Gamma's real-time surface is arrival-time only (SURVEY §2.7); these are
the Spark-native *stateful* extensions a streaming pipeline needs:
per-key state that survives across micro-batches with timeout-driven
emission. The shape here — user session tracking with gap timeout —
is the canonical one; swap the update function for other keyed
accumulators (running dedup filters, per-key counters, rate trackers).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

#: output schema: one row per closed (or force-flushed) session
SESSION_SCHEMA = (
    "user_id long, session_events long, session_start long, session_end long"
)
STATE_SCHEMA = "n long, start long, last long"

DEFAULT_SESSION_GAP_MS = 30 * 60 * 1000


def track_sessions(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
    gap_ms: int = DEFAULT_SESSION_GAP_MS,
) -> Iterator[pd.DataFrame]:
    """Per-user session accumulator: events extend the current session;
    a processing-time timeout (no events for the gap) closes it and
    emits one summary row. State is (count, start_epoch_ms,
    last_epoch_ms)."""
    (user_id,) = key
    if state.hasTimedOut:
        n, start, last = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_events": [n],
                "session_start": [start],
                "session_end": [last],
            }
        )
        return

    n, start, last = state.get if state.exists else (0, None, None)
    for pdf in pdfs:
        if pdf.empty:
            continue
        ts = pdf["ts_ms"]
        n += len(pdf)
        start = int(ts.min()) if start is None else min(start, int(ts.min()))
        last = int(ts.max()) if last is None else max(last, int(ts.max()))
    state.update((n, start, last))
    state.setTimeoutDuration(gap_ms)
    # nothing closes this batch -> emit nothing (yielding an empty
    # DataFrame crashes the Arrow state-serializer worker)
    return


def sessionize_stream(events, gap_ms: int = DEFAULT_SESSION_GAP_MS):
    """Wire the stateful sessionizer onto a stream carrying
    (user_id long, ts_ms long). Returns the streaming DataFrame of
    closed sessions (update output mode). ``gap_ms`` is the
    processing-time inactivity timeout that closes a session."""

    def fn(key, pdfs, state):
        yield from track_sessions(key, pdfs, state, gap_ms=gap_ms)

    return events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
    )
