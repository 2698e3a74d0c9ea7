"""Streaming maintenance of the ExactSubstr window-hash store.

Each micro-batch of documents flows through
:func:`~mongo_es_spark.operators.text.incremental_substring_dedup`:
the batch is deduplicated against every window first seen by any
earlier trigger (plus the batch itself), and its first-seen window
hashes append to the store.  The append is guarded by an
order-independent content-folded batch digest, so a foreachBatch
REPLAY after checkpoint recovery appends nothing and returns
identical rows — at-least-once delivery composes into exactly-once
store state, the same idempotence story as the line-dedup and
signature stores.

Like first-occurrence-wins line dedup (and unlike the running
boilerplate DF store), ExactSubstr is causal: the global winner of a
window is its first ``(doc, pos)`` instance, so an availableNow
drain over an id-ORDERED file feed reproduces the one-shot batch
operator EXACTLY — which is what the registry query pins under the
batch query's own cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.text import incremental_substring_dedup
from .boilerplate import write_batch_output


def run_streaming_substring_dedup(
    spark: SparkSession,
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    window_tokens: int = 8,
):
    """Start the stream: per trigger, dedup the batch's windows
    against the running store and append the batch's first-seen
    window hashes.  Per-batch cleaned documents land under
    ``out_path`` in their own ``__batch_id`` partition via dynamic
    partition overwrite (replay rewrites, never duplicates)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_substring_dedup(
            spark,
            batch_df,
            id_col,
            text_col,
            store_path,
            window_tokens=window_tokens,
        )
        write_batch_output(out, batch_id, out_path)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
