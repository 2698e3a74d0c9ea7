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

__all__ = ["table_profile", "table_quantiles"]


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
