"""Scan-phase plan builder: source DataFrame -> mapped sink rows.

Re-expresses the reference's backfill pipeline (S1 collection scan, F1
projection pushdown, F2 resume filter, T1 field-mapping transform —
reference: src/mongodb.ts:33-42, src/processor.ts:51-89,299-330) as ONE
declarative ``filter + select``:

* projection & column pruning — Catalyst pushes the ``select`` to the
  scan (``ReadSchema`` shows only mapped paths);
* the resume predicate ``_id >= checkpoint`` is a pushed filter
  (``PushedFilters`` on parquet / the connector);
* dot-path mapping compiles to column expressions at plan time — zero
  Python in the hot path, fully whole-stage-codegen'd.

Scale note: this plan has NO shuffle — it is scan -> project -> sink,
embarrassingly parallel across any number of executors; at 100 TB the
only knobs are input split size and sink parallelism.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..config import Task
from ..functions.columns import has_path, nest_target_paths, source_path_col


def _mapped_exprs(df: DataFrame, task: Task) -> dict[str, Column]:
    """Target-path -> column expression for every mapped/static field.

    Static constants seed the output and mapped fields overwrite them
    (reference: src/processor.ts:66-78).  Mapped source paths missing
    from the source schema are dropped at plan time — the runtime
    equivalent of ``_.has`` failing for every row.
    """
    exprs: dict[str, Column] = {
        path: F.lit(value) for path, value in task.transform.static.items()
    }
    for src, dst in task.transform.mapping.items():
        if has_path(df, src):
            exprs[dst] = source_path_col(df, src)
    return exprs


def scan_mapped_frame(
    df: DataFrame,
    task: Task,
    id_column: str = "_id",
    resume_id=None,
) -> DataFrame:
    """Flat sink-shaped rows: ``_id`` (stringified) + mapped fields.

    This is the shape the bulk sink writes for the scan phase (upsert
    by ``_id`` — reference: src/processor.ts:233-243).
    """
    if resume_id is not None:
        df = df.filter(F.col(id_column) >= F.lit(resume_id))  # F2
    exprs = _mapped_exprs(df, task)
    cols = [F.col(id_column).cast("string").alias("_id")]
    cols += nest_target_paths(exprs)
    return df.select(*cols)


def scan_ir_frame(
    df: DataFrame,
    task: Task,
    id_column: str = "_id",
    resume_id=None,
    timestamp: Optional[Column] = None,
) -> DataFrame:
    """IR-shaped rows ``(action, id, parent, data, timestamp)``
    (reference: src/types.ts:46-63) with ``data`` as a nested struct.

    Rows whose mapped ``data`` would be empty are dropped only when the
    task maps nothing that exists — with a plan-time schema the
    emptiness of ``data`` is decidable per column set, matching
    ``_.isEmpty(data)`` (src/processor.ts:79-81).
    """
    if resume_id is not None:
        df = df.filter(F.col(id_column) >= F.lit(resume_id))
    exprs = _mapped_exprs(df, task)
    parent = (
        source_path_col(df, task.transform.parent).cast("string")
        if task.transform.parent and has_path(df, task.transform.parent)
        else F.lit(None).cast("string")
    )
    ts = timestamp if timestamp is not None else F.lit(0).cast("long")
    if not exprs:
        # nothing mapped: every row's data is empty -> all dropped
        return df.sparkSession.createDataFrame(
            [], "action string, id string, parent string, timestamp long"
        )
    return df.select(
        F.lit("upsert").alias("action"),
        F.col(id_column).cast("string").alias("id"),
        parent.alias("parent"),
        F.struct(*nest_target_paths(exprs)).alias("data"),
        ts.alias("timestamp"),
    )
