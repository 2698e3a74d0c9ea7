"""Temporal joins: as-of and bounded range joins over event streams.

Greenfield operators (SURVEY §2.2 notes the reference has no join
surface beyond point lookups; SURVEY §7 step 9 adds the operations a
training-data / event pipeline needs).  Both are built so the plan
survives a 100 TB scale-up:

* ``asof_join`` uses the union+window formulation — ONE shuffle on the
  join key, no range-condition join (which Spark would execute as a
  per-key sort anyway, or worse, a broadcast nested loop when the
  equi-key is absent).  Each left row picks up the latest right row
  with ``right.ts <= left.ts`` via a partition-local running
  ``last(..., ignorenulls)`` window — work is O(n log n) per key from
  the sort, not O(left × right).
* ``bucketed_range_join`` joins two event sets on |l.ts - r.ts| <=
  window by quantizing time into window-sized buckets and equi-joining
  each left bucket against the three covering right buckets.  The
  inequality becomes an equi-join Catalyst can shuffle-hash: work and
  partitioning scale with events-per-bucket, never the cross product.
  (Spark's own plan for a bare inequality join is
  BroadcastNestedLoopJoin — a scale killer this operator exists to
  avoid.)
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["asof_join", "bucketed_range_join", "salted_join"]


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    value_cols: Sequence[str],
    tiebreak_col: Optional[str] = None,
    suffix: str = "_asof",
) -> DataFrame:
    """For each left row, attach the most recent right row with
    ``right_ts <= left_ts`` on the same key (backward as-of join,
    inclusive; left rows with no prior right row keep nulls).

    ``right`` must carry ``on + [right_ts] + value_cols`` (+ the
    optional tiebreak).  Output = every left column, plus each value
    column and the matched right timestamp as ``<name><suffix>``.

    Ties on ``right_ts`` resolve to the greatest ``tiebreak_col``
    (required for determinism when right timestamps can collide).

    Implementation: union both sides tagged with a side marker, sort
    per key by (ts, side, tiebreak) inside a single window partition —
    right rows order BEFORE left rows at equal ts, so the inclusive
    match is exactly "last right-side row at or above me" — and carry
    right values forward with ``last(..., ignorenulls=True)``.  One
    shuffle; the window spills, never collects a key to the driver.
    """
    on = list(on)
    value_cols = list(value_cols)
    lcols = left.columns
    out_vals = [f"{c}{suffix}" for c in value_cols]
    out_ts = f"{right_ts}{suffix}"

    packed = F.struct(*[F.col(c) for c in lcols]).alias("__left")
    l_tagged = left.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(on)],
        F.col(left_ts).cast("long").alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast("long").alias("__tie"),
        packed,
        F.lit(None).cast("long").alias("__rts"),
        *[F.lit(None).alias(c) for c in value_cols],
    )
    tie = (
        F.col(tiebreak_col).cast("long")
        if tiebreak_col
        else F.lit(0).cast("long")
    )
    # right rows carry a typed-null left payload so the union lines up
    left_struct_type = left.select(packed).schema[0].dataType.simpleString()
    r_tagged = right.select(
        *[F.col(k).alias(f"__k{i}") for i, k in enumerate(on)],
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__side"),
        tie.alias("__tie"),
        F.lit(None).cast(left_struct_type).alias("__left"),
        F.col(right_ts).cast("long").alias("__rts"),
        *value_cols,
    )

    unioned = l_tagged.unionByName(r_tagged)
    keys = [f"__k{i}" for i in range(len(on))]
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts").asc(), F.col("__side").asc(), F.col("__tie").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    payload = F.struct(
        F.col("__rts").alias("__rts"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    attached = unioned.withColumn(
        "__match",
        F.last(
            F.when(F.col("__side") == 0, payload), ignorenulls=True
        ).over(w),
    )
    return attached.filter(F.col("__side") == 1).select(
        *[F.col(f"__left.{c}").alias(c) for c in lcols],
        F.col("__match.__rts").alias(out_ts),
        *[
            F.col(f"__match.{c}").alias(o)
            for c, o in zip(value_cols, out_vals)
        ],
    )


def bucketed_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window_ms: int,
    on: Sequence[str] = (),
) -> DataFrame:
    """Inner-join left and right rows with ``|left_ts - right_ts| <=
    window_ms`` (plus optional equi-keys), as an equi-join on
    window-sized time buckets.

    Right rows are replicated to their bucket and both neighbors
    (3x — bounded, bucket-local), so every qualifying pair meets in
    exactly one task; a residual filter applies the exact predicate.
    Output carries all left columns plus right's ts and non-key
    columns (callers aggregate from there).
    """
    if window_ms <= 0:
        raise ValueError("window_ms must be positive")
    on = list(on)
    l_b = (F.col(left_ts).cast("long") / F.lit(window_ms)).cast("long")
    r_b = (F.col(right_ts).cast("long") / F.lit(window_ms)).cast("long")
    l_tag = left.withColumn("__bucket", l_b)
    r_cols = [c for c in right.columns if c not in on]
    r_tag = right.select(
        *on,
        *r_cols,
        F.explode(
            F.array(r_b - 1, r_b, r_b + 1)
        ).alias("__bucket"),
    )
    cond = [l_tag["__bucket"] == r_tag["__bucket"]] + [
        l_tag[k] == r_tag[k] for k in on
    ]
    joined = l_tag.join(r_tag, cond, "inner").filter(
        F.abs(
            l_tag[left_ts].cast("long") - r_tag[right_ts].cast("long")
        )
        <= window_ms
    )
    return joined.select(
        *[l_tag[c] for c in left.columns],
        *[r_tag[c] for c in r_cols],
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-mitigation equi-join: split every hot key's rows across
    ``n_salts`` shuffle partitions by salting the big side, replicate
    the small side once per salt, and join on ``(key, salt)``.

    The one-hot-key pathology (90% of a 100 TB fact table sharing one
    key) turns a plain shuffle join into a single straggler task; the
    salted form bounds any task at ~1/n_salts of the hot key.  AQE's
    skew-join split handles the sort-merge case adaptively at runtime;
    explicit salting is the deterministic contract that (a) also works
    when AQE statistics are stale or disabled and (b) composes under a
    following per-key aggregation.  The salt value is arbitrary per
    row (any value joins correctly against the replicated side), but
    it must be DETERMINISTIC per row: a salt drawn from
    ``monotonically_increasing_id()`` or ``rand()`` changes when a map
    task is recomputed after a fetch failure, landing recomputed rows
    in different ``(key, salt)`` shuffle partitions — which can
    silently duplicate or drop rows on a real cluster.  So the salt
    hashes the full row content (all of ``big``'s columns): stable
    under retry, no extra shuffle, and exact duplicate rows sharing a
    salt is harmless — they still join correctly and duplicates of a
    hot key's payload are rare by definition of a join payload.

    Result equals ``big.join(small, on, how)`` exactly, including
    under task retry.  ``how`` supports the key-preserving variants
    (inner / left).
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner and left joins")
    keys = list(on)

    # MapType is not hashable in Spark SQL — and the check must be
    # RECURSIVE: a struct<m: map<...>> or array<map<...>> column fails
    # xxhash64 analysis just like a top-level map
    def _hashable(dt) -> bool:
        from pyspark.sql.types import ArrayType, MapType, StructType

        if isinstance(dt, MapType):
            return False
        if isinstance(dt, ArrayType):
            return _hashable(dt.elementType)
        if isinstance(dt, StructType):
            return all(_hashable(f.dataType) for f in dt.fields)
        return True

    hashable = [
        f.name for f in big.schema.fields if _hashable(f.dataType)
    ]
    if hashable:
        salt = F.pmod(
            F.xxhash64(*[F.col(c) for c in hashable]), F.lit(n_salts)
        ).cast("int")
    else:
        # nothing hashable to derive a deterministic per-row salt
        # from: degrade to an unsalted (but still correct) join shape
        salt = F.lit(0).cast("int")
    big_s = big.withColumn("__salt", salt)
    small_s = small.withColumn(
        "__salt",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))),
    )
    return big_s.join(small_s, keys + ["__salt"], how).drop("__salt")
