"""Streaming maintenance of the boilerplate chunk-DF store.

Each micro-batch of documents flows through
:func:`~mongo_es_spark.operators.text.incremental_boilerplate`: the
batch is cleaned against the cumulative chunk document frequencies
(store + batch) and its own per-chunk doc counts append to the store.
Because the store append is guarded by an order-independent batch
digest, a foreachBatch REPLAY after a checkpoint recovery appends
nothing — the at-least-once hook composes with the store's
at-most-once append into effective exactly-once DF accounting.

Batch order does not affect the final store (DF sums commute), so an
availableNow drain over a file feed reproduces the full-corpus counts
exactly — pinned by the registry query's cross-engine oracle through
``boilerplate_clean_over_store``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.text import incremental_boilerplate


def write_batch_output(
    out: DataFrame, batch_id: int, out_path: str
) -> None:
    """Idempotent per-batch output write: the batch's rows land in
    their own ``__batch_id`` partition under dynamic partition
    overwrite, so replaying the same batch id rewrites that partition
    instead of appending duplicates."""
    (
        out.withColumn("__batch_id", F.lit(int(batch_id)))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(out_path)
    )


def run_streaming_boilerplate(
    spark: SparkSession,
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    chunk_words: int = 4,
    min_df: int = 2,
):
    """Start the stream: per trigger, clean the batch against the
    running store and append its chunk-DF counts.  Per-batch cleaned
    documents land under ``out_path`` (running semantics — an early
    batch cannot see a later batch's templates; re-clean via
    ``boilerplate_clean_over_store`` when retroactive removal
    matters).

    The output write is replay-guarded to match the store append:
    each batch lands in its own ``__batch_id`` partition under
    DYNAMIC partition overwrite, so a foreachBatch replay after
    checkpoint recovery rewrites its own partition idempotently
    instead of appending duplicate cleaned rows."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_boilerplate(
            spark,
            batch_df,
            id_col,
            text_col,
            store_path,
            chunk_words=chunk_words,
            min_df=min_df,
        )
        write_batch_output(out, batch_id, out_path)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
