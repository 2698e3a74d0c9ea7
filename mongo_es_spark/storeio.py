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

import os
from typing import Callable, Optional

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "read_parquet_if_exists",
    "list_data_files",
    "rewrite_store",
]

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


def list_data_files(path: str) -> list[str]:
    """Every data file under a parquet store directory (``_``/``.``
    prefixed sidecars and markers excluded) — the set a compaction
    pass replaces."""
    out: list[str] = []
    for root, _dirs, files in os.walk(path):
        for f in files:
            if not f.startswith(("_", ".")):
                out.append(os.path.join(root, f))
    return out


def rewrite_store(path: str, write_new: Callable[[str], None]) -> None:
    """Crash-aware in-place rewrite of a parquet store directory, for
    compaction passes whose rows are NOT idempotent under duplication
    (postings, docstats, doc-label stores — appending the compacted
    copy next to the originals would double-count).

    Sequence: ``write_new(path__new)`` writes the full replacement,
    then two renames swap it in, then the old copy is dropped.  The
    live directory is only ever renamed AFTER the replacement is
    complete, so a re-run self-heals every crash point: a missing live
    dir with a ``__new`` present means the swap lost the race between
    its two renames — finish it.  Maintenance-op contract: single
    writer, no concurrent queries during the swap window (the classic
    OPTIMIZE/VACUUM exclusivity).  Local-filesystem renames; an object
    store deployment would use the FileSystem committer instead.
    """
    import shutil

    new, old = path + "__new", path + "__old"
    if not os.path.isdir(path):
        if os.path.isdir(new):
            os.rename(new, path)  # self-heal a crashed swap
            shutil.rmtree(old, ignore_errors=True)
        else:
            raise ValueError(f"no store directory at {path}")
    shutil.rmtree(new, ignore_errors=True)
    shutil.rmtree(old, ignore_errors=True)
    write_new(new)
    os.rename(path, old)
    os.rename(new, path)
    shutil.rmtree(old)
