"""Custom stateful streaming operator: cross-batch sessionization.

``applyInPandasWithState`` twin of the batch ``events_sessionize`` query
(queries.py, oracle-checked): gap-based sessions over the events stream,
where a session may START in one micro-batch and CLOSE in a later one —
the per-user open session lives in the state store between batches (and
across restarts: the test re-opens the checkpoint in a second query run).

Semantics (identical to the batch query, gap = 1800 s):
- events for a user, ordered by (ts, event_id), belong to one session
  until a gap > ``gap_sec`` appears; the next event opens a new session;
- a session row (user_id, session_id, n_events, first_event, last_event)
  is emitted when the session CLOSES: either a later event for the same
  user arrives past the gap, or the event-time watermark passes
  last_ts + gap (timeout — no later event can extend it);
- sessions still open at end-of-stream are not emitted (they are not
  closed yet); they remain in the state store for the next run.

Scale notes: state is one fixed-width row per ACTIVE user (bounded by the
watermark timeout, not by history); the shuffle is the groupBy(user_id)
hash partition — the same key the batch job aggregates on; per-batch work
is Arrow-batched pandas, no per-row Python in the plan.
"""

# NB: no `from __future__ import annotations` (pandas_udf hint resolution)

from typing import Any, Iterator, Tuple

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType(), False),
        T.StructField("session_id", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("first_event", T.LongType(), False),
        T.StructField("last_event", T.LongType(), False),
    ]
)

# open-session state: (session_id, last_ts_sec, n_events, first_event, last_event)
SESSION_STATE = T.StructType(
    [
        T.StructField("session_id", T.LongType(), False),
        T.StructField("last_ts_sec", T.LongType(), False),
        T.StructField("n_events", T.LongType(), False),
        T.StructField("first_event", T.LongType(), False),
        T.StructField("last_event", T.LongType(), False),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_sec: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Gap-based sessionization over a streaming events frame
    (event_id, ts, user_id, ...), emitting CLOSED sessions only.

    The input gets ``withWatermark("ts", watermark)``; the state timeout is
    event-time, so an open session closes exactly when the watermark proves
    no in-order event can extend it.
    """
    gap_ms = int(gap_sec) * 1000

    def assemble(
        key: Tuple[Any],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id = int(key[0])
        closed = []  # (session_id, n_events, first_event, last_event)

        if state.hasTimedOut:
            # watermark passed last_ts + gap: no event can extend the open
            # session any more — emit it and drop the state
            sid, _last, n, first, last = state.get
            closed.append((sid, n, first, last))
            state.remove()
        else:
            ev = pd.concat(list(pdfs), ignore_index=True)
            ev = ev.sort_values(["ts", "event_id"], kind="mergesort")
            # normalize to ns regardless of the Arrow-side datetime unit
            ts_sec = (
                ev["ts"].astype("datetime64[ns]").astype("int64") // 1_000_000_000
            ).to_numpy()
            eid = ev["event_id"].astype("int64").to_numpy()

            if state.exists:
                sid, last_ts, n, first, last = state.get
            else:
                sid, last_ts, n, first, last = 0, None, 0, None, None

            m = len(ev)
            if m:
                # vectorized gap detection; the Python loop below is per
                # SESSION SEGMENT (a handful per user-batch), not per event
                new_seg = np.ones(m, dtype=bool)
                new_seg[1:] = (ts_sec[1:] - ts_sec[:-1]) > gap_sec
                if n > 0 and ts_sec[0] - last_ts <= gap_sec:
                    new_seg[0] = False
                seg_starts = np.flatnonzero(new_seg)
                if not new_seg[0]:
                    seg_starts = np.concatenate(([0], seg_starts))
                seg_ends = np.concatenate((seg_starts[1:], [m]))
                for a, b in zip(seg_starts, seg_ends):
                    a, b = int(a), int(b)
                    if n > 0 and not new_seg[a]:
                        # continuation of the open session (first segment only)
                        n += b - a
                        last = int(eid[b - 1])
                    else:
                        if n > 0:
                            closed.append((sid, n, first, last))
                        sid += 1
                        n = b - a
                        first, last = int(eid[a]), int(eid[b - 1])
                    last_ts = int(ts_sec[b - 1])

            if n > 0:
                state.update((sid, last_ts, n, first, last))
                # close via timeout once the watermark passes last_ts + gap;
                # Spark rejects timestamps <= the current watermark, so clamp
                wm = state.getCurrentWatermarkMs()
                state.setTimeoutTimestamp(max(last_ts * 1000 + gap_ms, wm + 1))

        if closed:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(closed),
                    "session_id": [c[0] for c in closed],
                    "n_events": [c[1] for c in closed],
                    "first_event": [c[2] for c in closed],
                    "last_event": [c[3] for c in closed],
                }
            )

    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            assemble,
            outputStructType=SESSION_OUT,
            stateStructType=SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
