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

from typing import Sequence

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


def trailing_features(
    df: DataFrame,
    key_col: str,
    id_col: str,
    ts_col: str,
    value_col: str,
    window_ms: int,
) -> DataFrame:
    """Point-in-time trailing-window features — the feature-store
    primitive: for every event, aggregates over the key's events in
    ``[ts - window_ms, ts)``, STRICTLY before event time so a model
    trained on the output cannot leak the label row into its own
    features.

    Output: ``(key, id, ts, n_prev, sum_value_milli_prev)`` with
    the value sum in integer milli-units (exact, engine-portable);
    ``id_col`` rides along to identify the event row (the RANGE frame
    is value-based, so no tiebreaker is needed for determinism).

    One exchange keyed by ``key_col``; the RANGE frame is value-based
    on the timestamp so same-ms peers resolve identically everywhere.
    Per-key event volume bounds window state — hot keys concentrate
    work exactly like sessionize's window, and the same salting tools
    apply if a single key outgrows an executor.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col))
        .rangeBetween(-window_ms, -1)
    )
    milli = F.round(F.col(value_col) * 1000).cast("long")
    return df.select(
        F.col(key_col),
        F.col(id_col),
        F.col(ts_col),
        F.count("*").over(w).alias("n_prev"),
        F.coalesce(F.sum(milli).over(w), F.lit(0)).alias(
            "sum_value_milli_prev"
        ),
    )


def attribution(
    df: DataFrame,
    key_col: str,
    id_col: str,
    ts_col: str,
    type_col: str,
    touch_types: Sequence[str],
    conversion_type: str,
    lookback_ms: int,
) -> DataFrame:
    """First/last-touch conversion attribution: for every conversion
    event, the earliest and latest touch events (``touch_types``) by
    the same key in ``[ts - lookback_ms, ts)`` — strictly before
    conversion time, the same no-label-leakage contract as
    :func:`trailing_features`.

    All three attribution signals (first touch, last touch, touch
    count) come from ONE value-based RANGE frame over one key-sorted
    exchange — no conversions×touches self-join, which at scale
    multiplies every conversion by its lookback volume.  First/last
    are min/max over a ``(ts, id, type)`` struct (aggregate min/max
    skip the NULL structs non-touch rows produce; the unique id makes
    the ordering a total one, so ties at the same millisecond resolve
    identically in any engine).

    Output: one row per conversion — ``(key, conv_id, conv_ts,
    first_touch_id, first_touch_type, last_touch_id,
    last_touch_type, n_touches)``; conversions with no touch in the
    window keep NULL touch columns and ``n_touches = 0``.
    """
    w = (
        Window.partitionBy(key_col)
        .orderBy(F.col(ts_col))
        .rangeBetween(-lookback_ms, -1)
    )
    is_touch = F.col(type_col).isin(list(touch_types))
    touch_struct = F.when(
        is_touch,
        F.struct(
            F.col(ts_col).alias("ts"),
            F.col(id_col).alias("id"),
            F.col(type_col).alias("tp"),
        ),
    )
    first = F.min(touch_struct).over(w)
    last = F.max(touch_struct).over(w)
    n = F.coalesce(
        F.sum(is_touch.cast("long")).over(w), F.lit(0)
    )
    return (
        df.select(
            F.col(key_col),
            F.col(id_col),
            F.col(ts_col),
            F.col(type_col),
            first.alias("__f"),
            last.alias("__l"),
            n.alias("n_touches"),
        )
        .filter(F.col(type_col) == conversion_type)
        .select(
            F.col(key_col),
            F.col(id_col).alias("conv_id"),
            F.col(ts_col).alias("conv_ts"),
            F.col("__f.id").alias("first_touch_id"),
            F.col("__f.tp").alias("first_touch_type"),
            F.col("__l.id").alias("last_touch_id"),
            F.col("__l.tp").alias("last_touch_type"),
            "n_touches",
        )
    )


def transition_counts(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    order_col: str,
    state_col: str,
) -> DataFrame:
    """First-order Markov transition counts over per-key event
    sequences: for each key, order events by ``(ts, order)`` and count
    every consecutive ``(prev_state, next_state)`` pair corpus-wide —
    the journey/behavior-model aggregate (and the input to any
    sequence-anomaly scorer).

    One exchange keyed by ``key_col`` feeds the lag window; the
    transition aggregation is a hash agg over a state-pair key space
    (|states|^2 groups — tiny), with map-side partial combine.

    Output: ``(prev_state, next_state, n)``.
    """
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col), F.col(order_col)
    )
    prev = F.lag(F.col(state_col)).over(w)
    return (
        df.select(prev.alias("prev_state"), F.col(state_col).alias("next_state"))
        .filter(F.col("prev_state").isNotNull())
        .groupBy("prev_state", "next_state")
        .agg(F.count("*").alias("n"))
    )


def funnel(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    steps: tuple[str, ...],
    type_col: str = "event_type",
) -> DataFrame:
    """Ordered funnel: per key, the earliest completion time of each
    step where step ``i`` must occur STRICTLY after the key's chosen
    step ``i-1`` time (the classic signup -> click -> purchase
    conversion shape).  Greedy-earliest per step, which is optimal for
    "did the sequence happen" (taking the earliest prefix never
    prevents a later completion).

    One shuffle shape: every aggregation and join is keyed by
    ``key_col``, so after the first exchange the per-step refinements
    are co-partitioned (AQE reuses the partitioning).  Output:
    ``key, step1_ms, step2_ms, ..., converted`` with NULLs where the
    funnel stalled; only keys reaching step 1 appear.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    ev = df.select(
        F.col(key_col).alias("k"),
        F.col(ts_col).alias("t"),
        F.col(type_col).alias("ty"),
    )
    cur = (
        ev.filter(F.col("ty") == steps[0])
        .groupBy("k")
        .agg(F.min("t").alias("step1_ms"))
    )
    for i, step in enumerate(steps[1:], start=2):
        nxt = (
            ev.filter(F.col("ty") == step)
            .join(cur.select("k", F.col(f"step{i-1}_ms").alias("__prev")), "k")
            .filter(F.col("t") > F.col("__prev"))
            .groupBy("k")
            .agg(F.min("t").alias(f"step{i}_ms"))
        )
        cur = cur.join(nxt, "k", "left")
    out_cols = [F.col("k").alias(key_col)] + [
        F.col(f"step{i}_ms") for i in range(1, len(steps) + 1)
    ]
    return cur.select(
        *out_cols,
        F.col(f"step{len(steps)}_ms").isNotNull().alias("converted"),
    )


def retention(
    df: DataFrame,
    key_col: str,
    ts_col: str,
    anchor_type: str,
    type_col: str = "event_type",
    bucket_ms: int = 86_400_000,
) -> DataFrame:
    """Cohort retention: bucket each key by its first ``anchor_type``
    event (the cohort), then count distinct keys active at each bucket
    offset — the triangle matrix behind every retention curve.

    Shape: one key-keyed agg for cohorts, one key-keyed join (AQE
    broadcasts when the cohort side is small), a (key, cohort, offset)
    distinct and one (cohort, offset) agg — nothing global, no window.
    Pre-anchor activity is excluded (offset >= 0 only).

    Output: ``cohort_bucket, offset, n_active``.
    """
    ev = df.select(
        F.col(key_col).alias("k"),
        F.floor(F.col(ts_col) / F.lit(bucket_ms)).alias("b"),
        F.col(type_col).alias("ty"),
    )
    cohorts = (
        ev.filter(F.col("ty") == anchor_type)
        .groupBy("k")
        .agg(F.min("b").alias("cohort_bucket"))
    )
    return (
        ev.join(cohorts, "k")
        .select(
            "k", "cohort_bucket", (F.col("b") - F.col("cohort_bucket")).alias("offset")
        )
        .filter(F.col("offset") >= 0)
        .distinct()
        .groupBy("cohort_bucket", "offset")
        .agg(F.count("*").cast("long").alias("n_active"))
    )


def rate_anomalies(
    df: DataFrame,
    ts_col: str,
    type_col: str,
    bucket_ms: int = 3_600_000,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Event-rate anomaly detection — the monitoring query a CDC/event
    pipeline runs continuously: bucket counts per (type, window),
    z-score each bucket against its type's own mean/stddev, flag
    |z| >= threshold (traffic spikes, source outages, replay storms).

    Two aggregations sharing the type keying: per-(type, bucket)
    counts (map-side combined), then tiny per-type moment rows join
    back broadcast-style.  Population stddev over the type's observed
    buckets; types with one bucket or zero variance yield no
    anomalies (z undefined -> dropped), which is the right monitoring
    default.  Output: ``event_type, bucket, n, z`` for flagged
    buckets only.
    """
    counts = (
        df.select(
            F.col(type_col).alias("event_type"),
            F.floor(F.col(ts_col) / F.lit(bucket_ms)).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(F.count("*").cast("long").alias("n"))
    )
    return score_counts(counts, ["event_type"], z_threshold=z_threshold).select(
        "event_type", "bucket", "n", "z"
    )


def score_counts(
    counts: DataFrame,
    key_cols,
    n_col: str = "n",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Score a pre-bucketed count frame: z per row against its key
    group's mean/stddev, |z| >= threshold kept.  Shared by the batch
    monitor above and the streaming windowed monitor
    (streaming/windows.windowed_anomalies) — counts come from anywhere
    (raw events, a windowed-aggregation changelog), scoring is the
    same tiny broadcast-moments join."""
    stats = counts.groupBy(*key_cols).agg(
        F.avg(n_col).alias("__mu"),
        F.stddev_pop(n_col).alias("__sigma"),
    )
    z = (F.col(n_col) - F.col("__mu")) / F.col("__sigma")
    return (
        counts.join(F.broadcast(stats), list(key_cols))
        .filter(F.col("__sigma") > 0)
        .withColumn("z", F.floor(z * 1_000_000) / 1_000_000)
        .filter(F.abs(F.col("z")) >= z_threshold)
        .drop("__mu", "__sigma")
    )
