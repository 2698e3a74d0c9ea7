"""Streaming maintenance of the incremental connected-components
store.

Each micro-batch of near-duplicate PAIRS folds into the append-only
label + merge-edge stores via
:func:`~mongo_es_spark.operators.dedup.incremental_components`; the
batch's resolved ``(doc, component)`` view lands in its own
``__batch_id`` output partition.  The store needs no replay digest:
a re-delivered batch's docs anti-join away from the label store and
its edges project onto single components, so at-least-once
foreachBatch delivery composes into exactly-once store state
naturally (see the operator's idempotence note).

Component labels are min-reachable doc ids, and min composes across
merges in any order — so unlike the causal first-arrival stores
(line/substring dedup), an availableNow drain over ANY batching of
the pair set reproduces the one-shot ``dedup_components`` clustering
exactly; no feed ordering is required.  The registry query pins this
under the batch clustering's own cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.dedup import incremental_components
from .boilerplate import write_batch_output


def run_streaming_components(
    spark: SparkSession,
    pair_stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    i_col: str = "i",
    j_col: str = "j",
):
    """Start the stream: per trigger, fold the batch's pairs into the
    label + merge stores and write the batch endpoints' resolved
    components to their ``__batch_id`` partition (replay rewrites,
    never duplicates).  Read the corpus-wide clustering at any point
    with :func:`~mongo_es_spark.operators.dedup.components_over_store`.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_components(
            spark, batch_df, store_path, i_col=i_col, j_col=j_col
        )
        write_batch_output(out, batch_id, out_path)

    return (
        pair_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
