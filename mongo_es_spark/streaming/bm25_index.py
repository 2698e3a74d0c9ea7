"""Streaming maintenance of the incremental BM25 index.

Each micro-batch of DOCUMENTS folds into the append-only postings +
docstats stores via
:func:`~mongo_es_spark.operators.text.incremental_bm25_index`; the
batch's newly indexed ``(doc, dl)`` rows land in their own
``__batch_id`` output partition.  The store needs no replay digest:
identity is doc id, first-arrival-wins, so a re-delivered batch
anti-joins away against ``docstats`` and at-least-once foreachBatch
delivery composes into exactly-once index state naturally (see the
operator's crash-repair note for the partial-append case).

Document identity is order-free (docs are immutable by id), so an
availableNow drain over ANY batching of the corpus reproduces the
one-shot index exactly — query-time
:func:`~mongo_es_spark.operators.text.bm25_over_store` scores
identically to ``bm25_search`` over the union.  The registry query
pins this under the batch search's own cross-engine oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.text import incremental_bm25_index
from .boilerplate import write_batch_output


def run_streaming_bm25_index(
    spark: SparkSession,
    doc_stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Start the stream: per trigger, fold the batch's documents into
    the postings + docstats stores and write the newly indexed doc
    stats to their ``__batch_id`` partition (replay rewrites, never
    duplicates).  Query the index at any point with
    :func:`~mongo_es_spark.operators.text.bm25_over_store`.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_bm25_index(
            spark,
            batch_df,
            store_path,
            id_col=id_col,
            text_col=text_col,
        )
        write_batch_output(out, batch_id, out_path)

    return (
        doc_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
