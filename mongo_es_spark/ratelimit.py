"""C1 — the docs/s read-capacity limiter, Spark-first.

The reference throttles the MongoDB read stream with a 1-second
token window: count docs as they flow, pause the stream when the
per-second budget is spent, resume on the next second's tick
(reference: src/processor.ts:31-49, ``controlReadCapacity``).

Spark has no pause/resume on a source, but it has something
equivalent and better suited to a distributed read: *iterator pull*.
Every stage pulls rows from its upstream lazily, so a pacing
pass-through placed over the source throttles the actual read —
the scan only fetches as fast as the paced consumer drains it.

Implementation: :func:`throttle` wraps a DataFrame in an
Arrow-batched ``mapInPandas`` identity whose only side effect is a
token-bucket sleep sized to the batch.  The bucket's burst window is
one second of capacity — the same budget shape as the reference's
per-second reset.  The global budget is split across the tasks that
can run concurrently (``capacity / concurrency`` per task), the
standard recipe for distributed rate limiting without a coordination
service: each of N parallel readers pacing at cap/N bounds the
aggregate at cap.  When fewer tasks than N are actually running the
aggregate undershoots — acceptable for a *limiter* (it never
overshoots), and exact in the steady state where the scan keeps all
slots busy.

Off by default: ``capacity`` of ``None``/``inf``/``0`` returns the
input frame untouched — no Arrow boundary, no plan change.
"""

from __future__ import annotations

import math
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame


class TokenBucket:
    """Per-second token bucket (burst = 1 s of capacity).

    ``consume(n)`` blocks until ``n`` tokens are available; ``n``
    larger than the burst window sleeps proportionally (a 10k-row
    Arrow batch at 1k docs/s waits ~10 s — coarse-grained but exact
    on average, which is what a read-capacity limit means).

    Clock and sleep are injectable for tests.
    """

    def __init__(
        self,
        rate: float,
        monotonic: Callable[[], float] = time.monotonic,
        sleep: Callable[[float], None] = time.sleep,
    ):
        if rate <= 0:
            raise ValueError("rate must be positive")
        self.rate = float(rate)
        self.monotonic = monotonic
        self.sleep = sleep
        self.allowance = self.rate  # start with one second of burst
        self.last = monotonic()

    def consume(self, n: int) -> float:
        """Account for ``n`` items; returns the seconds slept."""
        now = self.monotonic()
        self.allowance = min(
            self.rate, self.allowance + (now - self.last) * self.rate
        )
        self.last = now
        if n <= self.allowance:
            self.allowance -= n
            return 0.0
        wait = (n - self.allowance) / self.rate
        self.sleep(wait)
        self.last = self.monotonic()
        self.allowance = 0.0
        return wait


def throttle(
    df: DataFrame,
    capacity: Optional[float],
    concurrency: Optional[int] = None,
) -> DataFrame:
    """Bound the read rate of ``df``'s upstream to ``capacity`` docs/s.

    A no-op (the frame is returned as-is) unless ``capacity`` is a
    positive finite number.  ``concurrency`` is the number of task
    slots the budget is split across; defaults to the cluster's
    ``defaultParallelism``.
    """
    if not capacity or math.isinf(capacity) or capacity <= 0:
        return df
    if concurrency is None:
        concurrency = df.sparkSession.sparkContext.defaultParallelism
    per_task = capacity / max(1, concurrency)

    schema = df.schema

    def pace(batches):
        bucket = TokenBucket(per_task)
        for pdf in batches:
            bucket.consume(len(pdf))
            yield pdf

    return df.mapInPandas(pace, schema)
