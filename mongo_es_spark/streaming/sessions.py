"""Streaming sessionization — the stateful twin of
``operators/sessions.sessionize`` (same output contract), built on
``applyInPandasWithState`` like the redelivery suppressor.

Per key the state holds ONE open session ``(session_id, start, last,
n)``.  Each micro-batch merges its (ts-sorted) events: an event within
``gap_ms`` of the open session extends it; a larger gap CLOSES the
open session (emitted downstream) and opens the next.  A
processing-time timeout of ``gap_ms`` flushes sessions whose keys go
quiet — so emission lags a real session end by at most one gap, and
state size tracks the *active* key set.

Contracts and caveats, stated honestly:

* per-key cross-batch ordering is assumed (true for an oplog tail /
  kafka partition keyed by id); a cross-batch *late* event within the
  open session's span still counts, but one older than a session
  already emitted starts a fresh session rather than reopening it —
  the same tradeoff Spark's own ``session_window`` + watermark makes.
* the idle flush uses processing time, not event time: a stalled feed
  closes sessions after ``gap_ms`` of wall-clock quiet.  Use the
  batch operator for exact event-time sessionization of bounded data.
* ``ttl=None`` (bounded ``availableNow`` runs): no timeouts, so
  still-open sessions at drain are NOT emitted — callers doing
  drain-and-stop runs should read them as "in progress".
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "session_id long, start long, last long, n long"


def _out_frame(key_col: str, key, rows: list) -> pd.DataFrame:
    return pd.DataFrame(
        {
            key_col: [key] * len(rows),
            "session_id": [r[0] for r in rows],
            "n_events": [r[1] for r in rows],
            "start_ms": [r[2] for r in rows],
            "end_ms": [r[3] for r in rows],
            "duration_ms": [r[3] - r[2] for r in rows],
        }
    )


def _merge(key_col: str, ts_col: str, order_col: str, gap_ms: int,
           use_timeout: bool):
    def func(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            sid, start, last, n = state.get
            state.remove()
            yield _out_frame(key_col, key[0], [(sid, n, start, last)])
            return
        batches = [p for p in pdfs if len(p)]
        if not batches:
            if use_timeout and state.exists:
                state.setTimeoutDuration(gap_ms)
            return
        events = pd.concat(batches, ignore_index=True).sort_values(
            [ts_col, order_col]
        )
        if state.exists:
            sid, start, last, n = state.get
            has_open = True
        else:
            sid, start, last, n = -1, 0, 0, 0
            has_open = False
        closed: list = []
        for t in events[ts_col].to_numpy():
            t = int(t)
            if not has_open:
                sid += 1
                start = last = t
                n = 1
                has_open = True
            elif t - last > gap_ms:
                closed.append((sid, n, start, last))
                sid += 1
                start = last = t
                n = 1
            else:
                last = max(last, t)
                n += 1
        state.update((sid, start, last, n))
        if use_timeout:
            state.setTimeoutDuration(gap_ms)
        if closed:
            yield _out_frame(key_col, key[0], closed)

    return func


def sessionize_stream(
    events: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    gap_ms: int,
    ttl: bool = True,
    key_type: str = "long",
) -> DataFrame:
    """Closed sessions per key: same columns as the batch
    ``sessionize`` (``key, session_id, n_events, start_ms, end_ms,
    duration_ms``), emitted when a later event or the idle timeout
    closes them.  ``ttl=False`` disables timeouts for bounded
    drain-and-stop runs (see module caveats)."""
    out_schema = (
        f"{key_col} {key_type}, session_id long, n_events long, "
        "start_ms long, end_ms long, duration_ms long"
    )
    timeout = (
        GroupStateTimeout.ProcessingTimeTimeout
        if ttl
        else GroupStateTimeout.NoTimeout
    )
    return events.groupBy(key_col).applyInPandasWithState(
        _merge(key_col, ts_col, order_col, gap_ms, ttl),
        outputStructType=out_schema,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
