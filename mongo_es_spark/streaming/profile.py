"""Streaming maintenance of the mergeable profile store.

Each micro-batch appends one DataSketches-HLL row per profiled
column through
:func:`~mongo_es_spark.operators.profile.incremental_profile`; the
whole-row content digest makes a foreachBatch replay after checkpoint
recovery a no-op, so at-least-once delivery composes into effective
exactly-once accounting — the curation-store idempotence story.
Counts sum and sketches union at read time
(:func:`~mongo_es_spark.operators.profile.profile_over_store`), so
the corpus is profiled as it lands without ever re-scanning history.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.profile import incremental_profile


def run_streaming_profile(
    spark: SparkSession,
    stream_df: DataFrame,
    store_path: str,
    checkpoint_path: str,
    columns,
):
    """Start the stream: per trigger, append the batch's per-column
    count/null/HLL rows to the store."""

    def handle(batch_df: DataFrame, _batch_id: int) -> None:
        incremental_profile(spark, batch_df, store_path, columns)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
