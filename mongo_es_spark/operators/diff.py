"""Snapshot diffing — audit what changed between two versions of a
keyed corpus/table (a pipeline rerun, a vendor re-delivery, a
backfill).

No reference counterpart (SURVEY §7 step 9 extension family).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["snapshot_diff"]


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    content_col: str,
) -> DataFrame:
    """Classify every key across two snapshots as ``added`` /
    ``removed`` / ``changed`` / ``unchanged``.

    Scale shape: content hashes (md5) are computed in the scan
    projection, so the full-outer equi-join shuffles 16 bytes of
    digest per side instead of document payloads; the classification
    is a post-join projection.  Output: ``(id, status)``.
    """
    a = old.select(
        F.col(id_col).alias("__ida"), F.md5(F.col(content_col)).alias("__ha")
    )
    b = new.select(
        F.col(id_col).alias("__idb"), F.md5(F.col(content_col)).alias("__hb")
    )
    joined = a.join(b, a["__ida"] == b["__idb"], "full_outer")
    return joined.select(
        F.coalesce(F.col("__ida"), F.col("__idb")).alias(id_col),
        F.when(F.col("__ida").isNull(), "added")
        .when(F.col("__idb").isNull(), "removed")
        # null-SAFE hash compare: md5(NULL) is NULL, and NULL = NULL
        # would fall through to 'changed' — a key whose content is
        # NULL in both snapshots is unchanged
        .when(F.col("__ha").eqNullSafe(F.col("__hb")), "unchanged")
        .otherwise("changed")
        .alias("status"),
    )
