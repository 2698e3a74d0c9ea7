"""Single-pass table profiling — the ingest-QA operator.

Before 100 TB enters a training pipeline someone asks: how many nulls
per column, how many distinct values, what ranges?  Answering with one
query per column scans the table N times; this operator computes every
column's statistics in ONE aggregation pass (Catalyst compiles the
multi-distinct into a single Expand + partial/final aggregate), then
unpivots to a long ``(column, n_nulls, n_distinct, min_value,
max_value)`` frame.

``exact_distinct=False`` swaps ``count(distinct)`` for HLL++
``approx_count_distinct`` — the 100 TB default, one pass with no
Expand multiplication; the exact form is the oracle-checkable one.

No reference counterpart (SURVEY §7 step 9).
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["table_profile", "table_quantiles", "key_skew_profile"]


def table_quantiles(
    df: DataFrame,
    cols: Sequence[str],
    probs: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact interpolated percentiles for every listed numeric column
    in ONE aggregation pass — the distribution half of the ingest-QA
    profile (:func:`table_profile` covers nulls/distincts/ranges).

    Uses ``percentile`` (exact, linear interpolation between closest
    ranks — the same definition as ANSI ``quantile_cont``), so any
    engine reproduces the numbers.  Exact percentiles buffer each
    column's values per partition; the 100 TB default is
    ``approx_percentile`` (KLL-sketch-style mergeable state), same
    call shape.  Output: one row per column, ``(column, p50, p90,
    p99)`` rounded to 6 dp.
    """
    aggs = []
    for c in cols:
        aggs.append(
            F.percentile(F.col(c), F.array(*[F.lit(p) for p in probs]))
            .alias(f"{c}__q")
        )
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', round({c}__q[0], 6), round({c}__q[1], 6), "
        f"round({c}__q[2], 6)"
        for c in cols
    )
    return wide.selectExpr(
        f"stack({len(cols)}, {stack_args}) as (column, p50, p90, p99)"
    )


def table_profile(
    df: DataFrame,
    cols: Sequence[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile of ``df`` in one aggregation pass.

    Output: ``column, n_rows, n_nulls, n_distinct, min_value,
    max_value`` — one row per profiled column, min/max rendered as
    strings so heterogeneous column types share a schema (cast AFTER
    the typed min/max, so ordering stays type-correct).
    """
    names = list(cols) if cols is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        col = F.col(c)
        aggs.append(
            F.count(F.when(col.isNull(), 1)).alias(f"{c}__nulls")
        )
        if exact_distinct:
            aggs.append(F.count_distinct(col).alias(f"{c}__nd"))
        else:
            aggs.append(F.approx_count_distinct(col).alias(f"{c}__nd"))
        aggs.append(F.min(col).cast("string").alias(f"{c}__mn"))
        aggs.append(F.max(col).cast("string").alias(f"{c}__mx"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', {c}__nulls, {c}__nd, {c}__mn, {c}__mx" for c in names
    )
    return wide.selectExpr(
        "__n as n_rows",
        f"stack({len(names)}, {stack_args}) as "
        "(column, n_nulls, n_distinct, min_value, max_value)",
    ).select(
        "column", "n_rows", "n_nulls", "n_distinct", "min_value", "max_value"
    )


def key_skew_profile(
    df: DataFrame, key_cols: Sequence[str], top_k: int = 10
) -> DataFrame:
    """Join/aggregation-key skew diagnostics — the pre-flight check
    before shuffling 100 TB on a key.  One row out:

    * ``n_rows`` / ``n_keys`` / ``avg_key_rows``: the baseline a
      uniform shuffle would see per key;
    * ``max_key_rows`` / ``p99_key_rows``: the hot-key tail (exact
      interpolated percentile over the per-key counts — the counts
      frame is |keys|-sized, already reduced);
    * ``skew_ratio`` = max/avg and ``topk_share`` = the heaviest
      ``top_k`` keys' fraction of all rows — the two numbers that
      decide between a plain shuffle, AQE skew-join, and explicit
      salting;
    * ``recommended_salts``: ``clamp(ceil(skew_ratio / 4), 1, 64)`` —
      the salt fan-out that brings the hottest key within ~4x of the
      average partition load (the ``salted_join`` n_salts input).

    Two aggregations over the per-key count frame (summary + top-k
    share) — the groupBy combines map-side, so the shuffled state is
    one row per distinct key, and everything after is |keys|-sized.
    """
    counts = df.groupBy(*key_cols).agg(F.count("*").alias("cnt"))
    summary = counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count("*").alias("n_keys"),
        F.max("cnt").alias("max_key_rows"),
        F.round(F.percentile(F.col("cnt"), F.lit(0.99)), 6).alias(
            "p99_key_rows"
        ),
    )
    topk = (
        counts.orderBy(
            F.col("cnt").desc(), *[F.col(c) for c in key_cols]
        )
        .limit(top_k)
        .agg(F.sum("cnt").alias("__top_rows"))
    )
    avg = F.col("n_rows").cast("double") / F.col("n_keys")
    skew = F.col("max_key_rows").cast("double") / avg
    return (
        summary.crossJoin(topk)
        .select(
            "n_rows",
            "n_keys",
            F.round(avg, 6).alias("avg_key_rows"),
            "max_key_rows",
            "p99_key_rows",
            F.round(skew, 6).alias("skew_ratio"),
            F.round(
                F.col("__top_rows").cast("double") / F.col("n_rows"), 6
            ).alias("topk_share"),
            F.least(
                F.lit(64),
                F.greatest(F.lit(1), F.ceil(skew / 4).cast("int")),
            )
            .cast("int")
            .alias("recommended_salts"),
        )
    )
