"""Event sessionization — the gaps-and-islands fold every behavioral
/ interaction-log pipeline needs before per-session features.

Batch twin of Spark's streaming ``session_window``: a new session
starts when the gap to the previous event of the same key exceeds
``gap_ms``.  Expressed as two key-partitioned windows (lag -> running
sum) plus one aggregation — all three reuse the SAME hash partitioning
on the key, so the whole operator costs one exchange and is fully
parallel across keys (no global window anywhere).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    gap_ms: int,
) -> DataFrame:
    """Per-key sessions: ``(key, session_id, n_events, start_ms,
    end_ms, duration_ms)``.

    ``order_col`` breaks timestamp ties deterministically (same-ms
    events are common in real logs); ``session_id`` numbers sessions
    per key from 0 in time order.
    """
    w = Window.partitionBy(key_col).orderBy(ts_col, order_col)
    gap = F.col(ts_col) - F.lag(ts_col).over(w)
    is_new = F.when(
        gap.isNull() | (gap > gap_ms), F.lit(1)
    ).otherwise(F.lit(0))
    numbered = df.withColumn(
        "__session", F.sum(is_new).over(w) - 1
    )
    return numbered.groupBy(
        F.col(key_col), F.col("__session").alias("session_id")
    ).agg(
        F.count("*").alias("n_events"),
        F.min(ts_col).alias("start_ms"),
        F.max(ts_col).alias("end_ms"),
        (F.max(ts_col) - F.min(ts_col)).alias("duration_ms"),
    )
