"""Streaming maintenance of the first-occurrence-wins segment store.

Each micro-batch of documents flows through
:func:`~mongo_es_spark.operators.text.incremental_line_dedup`: the
batch is cleaned against every segment kept by any earlier trigger,
and its newly-kept segment hashes append to the store.  The store
append is guarded by an order-independent content-folded batch
digest, so a foreachBatch REPLAY after checkpoint recovery appends
nothing and returns identical rows — at-least-once delivery composes
into exactly-once store state, the curation-store idempotence story.

Unlike the boilerplate store (running semantics — DF thresholds only
converge once the whole corpus has flowed through), first-arrival-
wins is causal: an availableNow drain over an id-ordered file feed
reproduces the one-shot batch operator EXACTLY, which is what the
registry query pins under the batch query's own cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.text import incremental_line_dedup
from .boilerplate import write_batch_output


def run_streaming_line_dedup(
    spark: SparkSession,
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    chunk_words: int = 4,
):
    """Start the stream: per trigger, dedup the batch's segments
    against the running store and append the batch's first
    occurrences.  Per-batch cleaned documents land under ``out_path``
    in their own ``__batch_id`` partition via dynamic partition
    overwrite (replay rewrites, never duplicates)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_line_dedup(
            spark,
            batch_df,
            id_col,
            text_col,
            store_path,
            chunk_words=chunk_words,
        )
        write_batch_output(out, batch_id, out_path)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
