"""Cross-batch redelivery suppression — the one genuinely *stateful*
streaming operator in the engine.

Why it exists: the reference checkpoints the tail phase at ``now − 10 s``
(reference: src/processor.ts:388), so a restart re-reads a 10-second
window of the oplog and relies on sink idempotence to absorb the
replays (at-least-once).  Idempotent upserts make replays *safe* but
not *free* — every replayed event still costs a lookup join and a bulk
write.  This operator drops already-processed events before they reach
the per-batch plan: per ``(ns, id)`` key it remembers the highest event
``ts`` processed and passes only strictly newer events.  BSON-style
timestamps (seconds<<32 | inc) are unique and monotonic per key, which
makes max-ts the exact dedup criterion.

Built on ``applyInPandasWithState``: state lives in Spark's state
store (checkpointed, partitioned by key, survives restarts), and a
processing-time timeout garbage-collects keys quiet for longer than
the redelivery window — state size tracks the *active* key set, not
stream history.
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..sources.cdc import OPLOG_SCHEMA

_STATE_SCHEMA = "max_ts long"


def _suppress(ttl_ms: int | None):
    def func(
        key: Tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        max_ts = state.get[0] if state.exists else -1
        new_max = max_ts
        for pdf in pdfs:
            fresh = pdf[pdf["ts"] > max_ts].sort_values("ts")
            if len(fresh):
                new_max = max(new_max, int(fresh["ts"].max()))
                yield fresh
        state.update((new_max,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)

    return func


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state_store(spark) -> None:
    """Switch streaming state to RocksDB — the production choice when
    the active key set outgrows executor heap (state spills to local
    disk, snapshots to the checkpoint location).  Applies to queries
    started after the call."""
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )


def suppress_redelivered(
    events: DataFrame, ttl_seconds: int | None = 60
) -> DataFrame:
    """Drop oplog events already processed for their ``(ns, id)`` key.

    ``ttl_seconds`` bounds state: a key idle that long is forgotten —
    size it at or above the redelivery window (the reference's is 10 s)
    plus expected restart latency.  Pass ``None`` for bounded runs
    (``availableNow`` backfills): no per-key timeouts, so the query
    terminates when the feed drains — with ProcessingTimeTimeout the
    engine keeps scheduling timeout-firing batches, which is correct
    for a continuous tail but never lets a drain-and-stop run finish.

    For large active key sets pair with :func:`use_rocksdb_state_store`.
    """
    timeout = (
        GroupStateTimeout.NoTimeout
        if ttl_seconds is None
        else GroupStateTimeout.ProcessingTimeTimeout
    )
    return events.groupBy("ns", "id").applyInPandasWithState(
        _suppress(None if ttl_seconds is None else ttl_seconds * 1000),
        outputStructType=OPLOG_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=timeout,
    )
