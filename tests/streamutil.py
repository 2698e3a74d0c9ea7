"""Shared helper for draining streaming queries in tests.

``q.awaitTermination(t)`` returns ``False`` on timeout WITHOUT raising,
so a fixed-bound call silently falls through to assertions that then
read half-drained state (observed: a 60 s solo availableNow drain
outlasted a 600 s bound under 4-shard contention and the test failed on
an incomplete ``curated`` store instead of saying "timed out").  The
bound here is a HANG guard, not a timing assertion: keep waiting while
the stream is completing batches, and fail loudly only when it stops
making progress (or a generous absolute cap passes).
"""

from __future__ import annotations

import time


def drain(q, idle_timeout: float = 600.0, max_wait: float = 3000.0) -> None:
    """Block until streaming query ``q`` terminates.

    Progress-aware: the idle clock resets whenever a new micro-batch
    completes, so a slow-but-live drain under test-shard contention
    never trips it.  Raises ``AssertionError`` (never returns partial
    state to the caller's asserts) if the stream goes ``idle_timeout``
    seconds with no new batch or runs past ``max_wait`` overall.
    """
    t0 = time.time()
    last_key = None
    last_change = t0
    while not q.awaitTermination(10):
        now = time.time()
        p = q.lastProgress
        key = (p.get("batchId"), p.get("timestamp")) if p else None
        if key != last_key:
            last_key = key
            last_change = now
        if now - last_change > idle_timeout:
            q.stop()
            raise AssertionError(
                f"stream made no progress for {idle_timeout:.0f}s "
                f"(last progress: {last_key})"
            )
        if now - t0 > max_wait:
            q.stop()
            raise AssertionError(
                f"stream still running after {max_wait:.0f}s"
            )
