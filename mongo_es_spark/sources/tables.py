"""Parquet table access for the test fixtures (TESTDATA.md tables).

These parquet tables stand in for the reference's MongoDB collections
(S1 collection-scan source) in tests and benchmarks.  A real deployment
would swap in the Spark MongoDB connector behind the same interface
(see sources/mongo.py); everything downstream is source-agnostic
DataFrames.

Gotcha handled here: ``events.parquet``'s ``ts`` column has shipped
as TIMESTAMP(NANOS) in some fixture generations and TIMESTAMP(MICROS)
in others.  Downstream code wants one stable shape: plain nanosecond
longs (the cheapest representation for the CDC ``ts`` ordering key —
no timezone semantics to drag around).  NANOS becomes a long via
``spark.sql.legacy.parquet.nanosAsLong``; MICROS arrives as a
timestamp type and is converted with ``unix_micros`` (session tz
pinned to UTC, so TIMESTAMP_NTZ values are taken at face value).
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
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        df = _normalize_event_ts(df)
    return df


def _normalize_event_ts(df: DataFrame) -> DataFrame:
    """Expose ``events.ts`` as epoch-nanosecond BIGINT whatever the
    parquet physical type was (NANOS -> long via nanosAsLong, already
    done at scan; MICROS -> timestamp[_ntz] handled here)."""
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes).get("ts")
    if ts_type in ("timestamp", "timestamp_ntz"):
        df = df.withColumn(
            "ts",
            F.unix_micros(F.col("ts").cast("timestamp")) * F.lit(1000),
        )
    return df
