"""MongoDB sources (production path) — S1 collection scan + S2 change
stream via the Spark MongoDB connector.

The connector jar (``org.mongodb.spark:mongo-spark-connector``) is not
bundled in this environment, so these builders raise a clear error when
it is absent; tests use the parquet/file-feed stand-ins
(sources/tables.py, sources/cdc.py) which exercise the identical
downstream plan.

Reference parity:
* scan: ``find`` stream with projection + ``_id >= checkpoint``
  (src/mongodb.ts:33-42) -> batch read + pushed filter/projection;
* tail: tailable oplog cursor with ns/ts/fromMigrate predicates
  (src/mongodb.ts:44-59) -> change-stream readStream with a
  ``$match`` pipeline and ``startingTimestamp``.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession

from ..config import CheckPoint, Task


def _require_connector(spark: SparkSession) -> None:
    jars = spark.conf.get("spark.jars.packages", "") or ""
    if "mongo-spark-connector" not in jars:
        raise RuntimeError(
            "MongoDB Spark connector not on the classpath; add "
            "org.mongodb.spark:mongo-spark-connector to "
            "spark.jars.packages, or use the file-based sources "
            "(sources/tables.py, sources/cdc.py) for local runs"
        )


def mongo_collection(
    spark: SparkSession,
    url: str,
    task: Task,
    checkpoint: CheckPoint | None = None,
) -> DataFrame:
    """S1 — batch read of the task's collection with projection and
    resume-filter pushdown."""
    _require_connector(spark)
    df = (
        spark.read.format("mongodb")
        .option("connection.uri", url)
        .option("database", task.extract.db)
        .option("collection", task.extract.collection)
        .load()
    )
    if task.extract.projection:
        keep = [k for k, v in task.extract.projection.items() if v]
        if keep:
            df = df.select("_id", *keep)
    if checkpoint and checkpoint.phase == "scan":
        df = df.filter(df["_id"] >= checkpoint.id)
    return df


def mongo_change_stream(
    spark: SparkSession,
    url: str,
    task: Task,
    checkpoint: CheckPoint | None = None,
) -> DataFrame:
    """S2 — change-stream source with a namespace $match pipeline."""
    _require_connector(spark)
    pipeline = [
        {
            "$match": {
                "ns.db": task.extract.db,
                "ns.coll": task.extract.collection,
            }
        }
    ]
    reader = (
        spark.readStream.format("mongodb")
        .option("connection.uri", url)
        .option("database", task.extract.db)
        .option("collection", task.extract.collection)
        .option("aggregation.pipeline", json.dumps(pipeline))
        .option("change.stream.publish.full.document.only", "false")
    )
    if checkpoint and checkpoint.time:
        reader = reader.option(
            "change.stream.startup.mode.timestamp.start.at.operation.time",
            str(checkpoint.time // 1000),
        )
    return reader.load()
