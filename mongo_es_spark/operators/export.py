"""Training-shard export: write a curated corpus as size-bounded,
key-range-disjoint shards plus a manifest — the handoff format a
training loader consumes (deterministic ordering, resumable by shard,
no shard too big for a loader worker).

No reference counterpart (the reference's only sink is Elasticsearch,
src/elasticsearch.ts:22-28); this is the greenfield L1-style sink for
the 100 TB pipeline output.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def export_shards(
    df: DataFrame,
    path: str,
    order_col: str,
    rows_per_shard: int,
    fmt: str = "parquet",
    total_rows: int | None = None,
) -> DataFrame:
    """Write ``df`` under ``<path>/data`` as ``fmt`` shards of at most
    ``rows_per_shard`` rows, range-partitioned on ``order_col`` (so
    shard key ranges are disjoint and a loader can resume mid-corpus
    by key), and persist a manifest under ``<path>/manifest``.

    ``repartitionByRange`` samples the key distribution, so shards are
    balanced even under skew; ``maxRecordsPerFile`` hard-caps rows per
    file if a range partition still exceeds the target.  The one
    ``count()`` sizing job is amortized over an export-scale write —
    pass ``total_rows`` when the caller already knows it.

    Returns the manifest DataFrame:
    ``file, n_rows, min_key, max_key, bytes``.
    """
    if rows_per_shard <= 0:
        raise ValueError("rows_per_shard must be positive")
    n = total_rows if total_rows is not None else df.count()
    n_shards = max(1, math.ceil(n / rows_per_shard))
    data_path = os.path.join(path, "data")
    (
        df.repartitionByRange(n_shards, F.col(order_col))
        .write.option("maxRecordsPerFile", rows_per_shard)
        .mode("overwrite")
        .format(fmt)
        .save(data_path)
    )
    manifest = shard_manifest(df.sparkSession, data_path, order_col, fmt)
    manifest.write.mode("overwrite").parquet(os.path.join(path, "manifest"))
    return manifest


def shard_manifest(
    spark: SparkSession, data_path: str, order_col: str, fmt: str = "parquet"
) -> DataFrame:
    """Build the manifest by reading the shards back: per file, row
    count and key range from the data itself (not trusted metadata),
    byte size from the filesystem."""
    back = spark.read.format(fmt).load(data_path)
    per_file = (
        back.select(
            F.input_file_name().alias("file"), F.col(order_col).alias("k")
        )
        .groupBy("file")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("k").alias("min_key"),
            F.max("k").alias("max_key"),
        )
    )
    sizes = []
    for root, _dirs, files in os.walk(data_path):
        for name in files:
            if name.startswith(("_", ".")):
                continue
            full = os.path.join(root, name)
            sizes.append(("file:" + os.path.abspath(full), os.path.getsize(full)))
    size_df = spark.createDataFrame(sizes, "file string, bytes long")
    # normalize the URI forms (input_file_name yields file:///...)
    norm = F.regexp_replace(F.col("file"), "^file:/+", "file:/")
    return (
        per_file.withColumn("file", norm)
        .join(size_df.withColumn("file", norm), "file")
        .orderBy("min_key")
    )
