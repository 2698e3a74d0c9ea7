"""Streaming maintenance of the incremental seed-distance store.

Each micro-batch of EDGES folds into the append-only edge + distance
stores via
:func:`~mongo_es_spark.operators.similarity.incremental_seed_distance`;
the batch's strict improvements land in their own ``__batch_id``
output partition.  The store needs no replay digest: a re-delivered
batch's edges anti-join away and its relaxations are no longer strict
improvements, so at-least-once foreachBatch delivery composes into
exactly-once store state naturally (see the operator's idempotence
note).

Hop distances are min-over-paths and min composes across arrival
orders — so, like the components store and unlike the causal
first-arrival stores, an availableNow drain over ANY batching of the
edge set reproduces the one-shot ``seed_distance`` view exactly; no
feed ordering is required.  Seeds are folded with the FIRST batch
(idempotent on replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import incremental_seed_distance
from .boilerplate import write_batch_output


def run_streaming_seed_distance(
    spark: SparkSession,
    edge_stream: DataFrame,
    seeds: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint_path: str,
    i_col: str = "i",
    j_col: str = "j",
    seed_col: str = "doc",
    max_depth: int = 4,
    directed: bool = False,
):
    """Start the stream: per trigger, fold the batch's edges (and, on
    the first trigger, the static seed set) into the stores and write
    the batch's strict improvements to their ``__batch_id`` partition
    (replay rewrites, never duplicates).  Read the corpus-wide
    distance view at any point with
    :func:`~mongo_es_spark.operators.similarity.seed_distance_over_store`.
    """

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        out = incremental_seed_distance(
            spark,
            store_path,
            edges_batch=batch_df,
            seeds_batch=seeds if batch_id == 0 else None,
            i_col=i_col,
            j_col=j_col,
            seed_col=seed_col,
            max_depth=max_depth,
            directed=directed,
        )
        write_batch_output(out, batch_id, out_path)

    return (
        edge_stream.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
