"""Multi-dimensional data layout: Z-order (Morton) clustering for
file-level min/max pruning.

At 100 TB the dominant cost of a selective query is the scan, and
min/max pruning (parquet row-group statistics under pushed filters;
file-level skipping where the table format keeps per-file stats)
only prunes on columns the LAYOUT is sorted by: a 1-D sort on ``x``
makes every row group's ``y`` range the full domain, so ``WHERE y =
...`` reads everything.  Interleaving the bits
of bucketized column ranks (the Morton curve) bounds BOTH dimensions
per contiguous z-range — a file holding one of ``4^k`` z-blocks spans
``1/2^k`` of each dimension's domain, so range predicates on either
column (or both) prune to a small file subset.

Everything here is pure JVM expression work: bucket ranks are exact
integer arithmetic against one broadcast min/max row (no driver
collect — the bounds ride a 1-row crossJoin), the bit interleave is
``bits`` shift/and/or terms inside whole-stage codegen, and the
layout write is ``repartitionByRange`` on ``z`` (one range exchange)
with a within-partition sort.  No UDF, no shuffle beyond the one the
layout itself requires.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_frame", "write_zorder_layout", "zorder_block_stats"]


def _scaled(col: str, lo: str, hi: str, bits: int) -> Column:
    """Exact integer bucket rank in ``[0, 2^bits)``: integer multiply
    then integer DIV — reproducible bit-for-bit in any engine (no
    float rounding on the boundary)."""
    m = (1 << bits) - 1
    return F.expr(
        f"CAST((({col} - {lo}) * {m}) DIV greatest({hi} - {lo}, 1) "
        "AS BIGINT)"
    )


def zorder_frame(
    df: DataFrame, x_col: str, y_col: str, bits: int = 8
) -> DataFrame:
    """Append the Morton code ``z`` of ``(x_col, y_col)`` (both
    integral) to every row.  ``bits`` bits per dimension — ``z`` in
    ``[0, 4^bits)``.

    Domain-width guard: the exact bucket rank multiplies the span by
    ``2^bits - 1`` in 64-bit integer arithmetic, so a span wider than
    ``(2^63 - 1) / (2^bits - 1)`` (~3.6e16 at the default 8 bits —
    e.g. epoch-NANOSECOND timestamps spanning > ~14 months) would
    silently wrap under non-ANSI Spark and emit garbage codes.  The
    guard raises at evaluation time instead (a ``raise_error``
    branch inside the one-row bounds frame — no extra pass);
    pre-scale such columns (ns -> ms is the registered query's move)
    before z-ordering."""
    m = (1 << bits) - 1
    cap = ((1 << 63) - 1) // m

    def _guarded(lo, hi, name):
        # evaluated inside the 1-row bounds frame: no extra pass.
        # hi >= lo always (max/min of one column), so a NEGATIVE
        # 64-bit difference can only be wrap — the true span is in
        # [2^63, 2^64), far past the cap — raise on that too.  Both
        # branches are exact integer compares (no float rounding).
        span = F.col(hi) - F.col(lo)
        return F.when(
            (span > F.lit(cap)) | (span < F.lit(0)),
            F.raise_error(
                F.lit(
                    f"zorder_frame: span of {name} exceeds the exact "
                    f"{m}x bucket multiply — pre-scale the column"
                )
            ).cast("long"),
        ).otherwise(F.col(lo))

    bounds = df.agg(
        F.min(x_col).alias("__xlo"),
        F.max(x_col).alias("__xhi"),
        F.min(y_col).alias("__ylo"),
        F.max(y_col).alias("__yhi"),
    ).select(
        _guarded("__xlo", "__xhi", x_col).alias("__xlo"),
        "__xhi",
        _guarded("__ylo", "__yhi", y_col).alias("__ylo"),
        "__yhi",
    )
    j = df.crossJoin(F.broadcast(bounds))
    sx = _scaled(x_col, "__xlo", "__xhi", bits)
    sy = _scaled(y_col, "__ylo", "__yhi", bits)
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            F.shiftleft(F.shiftright(sx, i).bitwiseAND(F.lit(1)), 2 * i)
        ).bitwiseOR(
            F.shiftleft(
                F.shiftright(sy, i).bitwiseAND(F.lit(1)), 2 * i + 1
            )
        )
    return j.withColumn("z", z).drop("__xlo", "__xhi", "__ylo", "__yhi")


def write_zorder_layout(
    df: DataFrame,
    x_col: str,
    y_col: str,
    path: str,
    n_files: int = 32,
    bits: int = 8,
) -> None:
    """Write ``df`` z-clustered: range-partition on the Morton code
    (one exchange), sort within partitions, one file per partition —
    every output file covers a contiguous z-range, hence a bounded
    rectangle of ``(x, y)`` space for the scanner's min/max pruning."""
    (
        zorder_frame(df, x_col, y_col, bits)
        .repartitionByRange(n_files, "z")
        .sortWithinPartitions("z")
        .write.mode("overwrite")
        .parquet(path)
    )


def zorder_block_stats(
    zdf: DataFrame, x_col: str, y_col: str, block_shift: int
) -> DataFrame:
    """Per-z-block min/max spans of both dimensions — the pruning
    bound a file covering that block would advertise.  ``block_shift``
    groups ``4^?`` codes: block = ``z >> block_shift``."""
    return (
        zdf.groupBy(
            F.shiftright("z", block_shift).alias("block")
        )
        .agg(
            (F.max(x_col) - F.min(x_col)).alias("x_span"),
            (F.max(y_col) - F.min(y_col)).alias("y_span"),
            F.count("*").alias("n_rows"),
        )
    )
