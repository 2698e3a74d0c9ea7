"""Streaming maintenance of the winnowing-fingerprint store.

Each micro-batch of documents flows through
:func:`~mongo_es_spark.operators.dedup.incremental_winnow_pairs`:
the batch's fingerprints probe the persisted store, the pairs that
involve a batch document land in their own ``__batch_id`` output
partition, and the batch's fingerprint sets append to the store.
Replay needs no digest: already-stored ids anti-join away, so an
at-least-once redelivery emits no pairs and appends nothing —
at-least-once foreachBatch delivery composes into exactly-once store
state naturally (the signature-store idempotence story).

Because the fingerprint set fully determines the overlap score, the
family is EXACT and ORDER-FREE: the union of all batch outputs over
any disjoint feed equals the one-shot
:func:`~mongo_es_spark.operators.dedup.winnow_overlap_pairs` on the
full corpus, each pair reported once by the first batch containing
both members — which is what the registry query pins under the batch
query's own cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import incremental_winnow_pairs
from .boilerplate import write_batch_output


def run_streaming_winnow_pairs(
    spark: SparkSession,
    stream_df: DataFrame,
    id_col: str,
    text_col: str,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    k: int = 5,
    w: int = 4,
    threshold: float = 0.5,
    score: str = "containment",
):
    """Start the stream: per trigger, detect the batch's new
    passage-overlap pairs against the persisted fingerprint store,
    append its fingerprints, and write the pairs to their
    ``__batch_id`` partition (replay rewrites, never duplicates)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_winnow_pairs(
            spark,
            batch_df,
            id_col,
            text_col,
            store_path,
            k=k,
            w=w,
            threshold=threshold,
            score=score,
        )
        write_batch_output(out, batch_id, out_path)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
