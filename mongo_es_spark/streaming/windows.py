"""Event-time windowed aggregation over the CDC stream.

The reference has no event-time windowing (SURVEY §2.2) — ordering is
per-batch ts-sort + compaction, lateness is absorbed by the checkpoint
overlap.  This operator adds the Spark-native monitoring/analytics
surface on the same feed: tumbling event-time windows with a watermark
for late data, e.g. per-namespace/op change rates ("how many deletes
hit db.users in each 10 s window"), emitted append-mode once a window
is final.

Event time derives from the BSON timestamp's high bits
(seconds — the same extraction the transform layer uses,
reference: src/processor.ts:62,87).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def windowed_op_counts(
    events: DataFrame,
    window: str = "10 seconds",
    watermark: str = "30 seconds",
    ts_col: str = "ts",
) -> DataFrame:
    """Per (window, ns, op) event counts with late-data tolerance.

    Watermark semantics: rows later than ``watermark`` behind the max
    observed event time are dropped; a window emits exactly once, when
    the watermark passes its end — the streaming-native replacement
    for the reference's "sort each batch and hope" ordering story.
    State is bounded by the number of open windows × (ns, op) pairs.
    """
    with_time = events.withColumn(
        "event_time", F.timestamp_seconds(F.shiftright(F.col(ts_col), 32))
    )
    return (
        with_time.withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window), "ns", "op")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "ns",
            "op",
            "n",
        )
    )


def windowed_anomalies(counts: DataFrame, z_threshold: float = 3.0) -> DataFrame:
    """Score a ``windowed_op_counts`` changelog (batch read of the
    streaming sink): each (ns, op) series z-scored against its own
    window history — the continuous form of
    ``operators/sessions.rate_anomalies``.  The stream emits final
    windows append-only; this scoring pass runs batch over the
    accumulated sink (or inside ``foreachBatch`` on a schedule), so
    watermarking and anomaly math stay decoupled."""
    from ..operators.sessions import score_counts

    return score_counts(counts, ["ns", "op"], z_threshold=z_threshold).select(
        "window_start", "ns", "op", "n", "z"
    )
