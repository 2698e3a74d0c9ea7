"""Parquet table access for the test fixtures (TESTDATA.md tables).

These parquet tables stand in for the reference's MongoDB collections
(S1 collection-scan source) in tests and benchmarks.  A real deployment
would swap in the Spark MongoDB connector behind the same interface
(see sources/mongo.py); everything downstream is source-agnostic
DataFrames.

Gotcha handled here: ``events.parquet`` carries TIMESTAMP(NANOS), which
Spark's vectorized parquet reader rejects by default —
``spark.sql.legacy.parquet.nanosAsLong`` turns the column into plain
nanosecond longs, which is also the cheapest representation for the
CDC ``ts`` ordering key (no timezone semantics to drag around).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def prepare_session(spark: SparkSession) -> SparkSession:
    """Session settings required for deterministic, portable reads.

    Runtime-settable, so this works on any caller-provided session
    (the correctness driver constructs its own).
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    # the engine re-expresses JS/lodash/BSON semantics: nulls flow and
    # arithmetic wraps instead of raising (Spark 4 defaults to ANSI)
    spark.conf.set("spark.sql.ansi.enabled", "false")
    return spark


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    prepare_session(spark)
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
