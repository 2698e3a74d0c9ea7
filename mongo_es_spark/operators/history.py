"""CDC history: SCD2 validity intervals and point-in-time snapshots.

The reference materializes only the LATEST state of each key (bulk
upserts into ES — src/processor.ts:225-258).  These operators extend
the same oplog event algebra backward in time: the full version
history as type-2 slowly-changing-dimension rows, and the state of
the collection as of an arbitrary timestamp.  Both are pure
window/aggregation plans — one shuffle on the key, no state store,
no Python — so they run at oplog scale (the 100 TB shape is "years of
oplog in parquet; rebuild any day's snapshot").

Event semantics follow the synthetic oplog feed used across the repo
(events_as_oplog): 'i'/'u' write the payload (last-writer-wins per
field), 'd' deletes the key; a later 'i'/'u' revives it.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .compaction import compact_events

__all__ = ["scd2_intervals", "snapshot_at"]


def scd2_intervals(
    oplog: DataFrame,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str,
    payload_cols: Sequence[str],
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """Expand an oplog into SCD2 rows: one row per live version of a
    key, with ``valid_from`` / ``valid_to`` (null = still current).

    Every event opens a new version at its ts and closes the previous
    one (``lead`` over the per-key event order).  Delete events emit
    no row themselves — they only terminate the prior version, so a
    key deleted and never revived has a finite last interval.
    ``is_current`` marks the open version.

    Single window partitioned by key; versions stream out in event
    order without materializing per-key history anywhere.
    """
    keys = [F.col(k) for k in key_cols]
    order = [F.col(ts_col).asc()] + (
        [F.col(tiebreak_col).asc()] if tiebreak_col else []
    )
    w = Window.partitionBy(*keys).orderBy(*order)
    nxt = F.lead(F.col(ts_col)).over(w)
    return (
        oplog.withColumn("__valid_to", nxt)
        .filter(F.col(op_col) != "d")
        .select(
            *key_cols,
            *payload_cols,
            F.col(ts_col).cast("long").alias("valid_from"),
            F.col("__valid_to").cast("long").alias("valid_to"),
            F.col("__valid_to").isNull().alias("is_current"),
        )
    )


def snapshot_at(
    oplog: DataFrame,
    at_ts: int,
    key_cols: Sequence[str],
    ts_col: str,
    op_col: str,
    payload_cols: Sequence[str],
    tiebreak_col: Optional[str] = None,
) -> DataFrame:
    """Materialize the collection state as of ``at_ts`` (inclusive):
    per key, the effect of every event with ``ts <= at_ts``, dropping
    keys whose surviving operation is a delete.

    Time-travel = a ts filter + the existing one-shuffle compaction
    (operators/compaction.py).  When ``ts_col`` is a raw source column
    the predicate pushes to the scan; when it is derived (e.g.
    ``ts div 1e6``), pre-filter the raw column at the source for
    row-group pruning (see queries.events_as_oplog(max_ts_ms=...)) —
    this operator's filter then only re-asserts exactness.
    """
    upto = oplog.filter(F.col(ts_col).cast("long") <= F.lit(at_ts))
    comp = compact_events(
        upto,
        key_cols=list(key_cols),
        ts_col=ts_col,
        op_col=op_col,
        payload_cols=list(payload_cols),
        tiebreak_col=tiebreak_col,
    )
    return comp.filter(F.col(op_col) != "d").select(
        *key_cols, *payload_cols, F.col(ts_col).cast("long").alias("as_of_ts")
    )
