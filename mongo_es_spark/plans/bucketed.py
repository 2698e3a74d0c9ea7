"""Bucketed table layout: the co-located-join strategy for keys that
get joined repeatedly at scale.

``spark.read.parquet`` joins shuffle both sides on the join key every
time.  Writing the fact tables bucketed (hash-partitioned into a fixed
number of files per key, sorted within buckets) moves that shuffle to
WRITE time, once: every later equi-join on the bucket key runs
shuffle-free (the scan itself reports the hash distribution, and the
within-bucket sort order feeds the merge join directly).  At 100 TB,
"pay the shuffle once at ingest, never per query" is the difference
between an interactive join and a cluster-wide reshuffle.

No reference counterpart (the reference has no analytical joins);
SURVEY §7 step 9 scale work.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: Sequence[str],
    n_buckets: int,
    path: str,
    sort_cols: Optional[Sequence[str]] = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally in-bucket sorted)
    parquet table registered in the session catalog under ``name``,
    with files at ``path``.  Overwrites any previous registration —
    idempotent for re-runs."""
    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    writer = (
        df.write.mode("overwrite")
        .format("parquet")
        .option("path", path)
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(name)


def read_bucketed(spark: SparkSession, name: str) -> DataFrame:
    return spark.table(name)
