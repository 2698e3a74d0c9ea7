"""Parquet state-store reads that distinguish "not created yet" from
"broken".

Every incremental operator (signature stores, window-hash stores,
curation state, embedding cells) starts from an optional on-disk
store.  Treating ANY read failure as "store missing" — the easy
``except Exception`` — silently degrades dedup to batch-local and
re-appends already-stored rows on the next write, corrupting the
store's uniqueness invariant exactly when storage hiccups.  Only the
two conditions that genuinely mean "no data yet" map to ``None``;
everything else (permissions, corrupt footers, transient storage
errors) propagates.
"""

from __future__ import annotations

from typing import Optional

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

__all__ = ["read_parquet_if_exists"]

_MISSING = ("PATH_NOT_FOUND", "UNABLE_TO_INFER_SCHEMA")


def read_parquet_if_exists(
    spark: SparkSession, path: str
) -> Optional[DataFrame]:
    """``spark.read.parquet(path)``, or ``None`` when the path does
    not exist or holds no data files yet (e.g. only ``_``-prefixed
    sidecars from a partially-completed first write)."""
    try:
        return spark.read.parquet(path)
    except AnalysisException as exc:
        get = getattr(exc, "getCondition", None) or getattr(
            exc, "getErrorClass", None
        )
        cond = ""
        if get is not None:
            try:
                cond = get() or ""
            except Exception:
                cond = ""
        text = cond or str(exc)
        if any(m in text for m in _MISSING):
            return None
        raise
