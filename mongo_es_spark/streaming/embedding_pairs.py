"""Streaming maintenance of the incremental embedding near-dup store.

Each micro-batch of NEW vectors folds into the cell-partitioned
vector store via
:func:`~mongo_es_spark.operators.similarity.incremental_embedding_pairs`:
the FIRST batch trains the k-means quantizer (cells stay frozen from
then on — the property incrementality needs), every batch probes its
vectors against (store ∪ batch) within matching cells only, and the
batch's newly detected pairs land in their own ``__batch_id`` output
partition.  The store needs no replay digest: already-stored ids are
anti-joined away, so an at-least-once redelivery emits no pairs and
appends no vectors — at-least-once foreachBatch delivery composes
into exactly-once store state naturally.

Per-batch work is ``|new| × cell occupancy`` (never corpus²); the
union of all batch outputs is exactly the set of cell-bucketed
near-dup pairs, each reported once by the first batch that completed
it.  The registry query pins this under a verified-summary oracle
(precision-1 subset of the exact pair set, recall floor, exactly-once
indexing, replay no-op).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import incremental_embedding_pairs
from .boilerplate import write_batch_output


def run_streaming_embedding_pairs(
    spark: SparkSession,
    vec_stream: DataFrame,
    id_col: str,
    vec_col: str,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    threshold: float = 0.9,
    n_clusters: int = 16,
    seed: int = 7,
):
    """Start the stream: per trigger, detect the batch's new near-dup
    pairs against the persisted cell store, append its vectors, and
    write the pairs to their ``__batch_id`` partition (replay
    rewrites, never duplicates)."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_embedding_pairs(
            spark,
            batch_df,
            id_col,
            vec_col,
            store_path,
            threshold=threshold,
            n_clusters=n_clusters,
            seed=seed,
        )
        write_batch_output(out, batch_id, out_path)

    return (
        vec_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
