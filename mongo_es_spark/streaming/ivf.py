"""Streaming maintenance of the materialized IVF index — the last
store without a streaming edition (minhash / simhash / boilerplate /
payload-chunk all have one).

The first micro-batch TRAINS: it materializes the index (k-means on
the batch, vectors written partitioned by cell).  Every later batch
APPENDS: new vectors assign to the EXISTING centroids and land in
their cell partitions — no retrain, no rewrite of resident cells,
work ∝ the new batch (operators/similarity.append_to_ivf_index).
That is the production IVF ingest shape: assignment quality degrades
only as the distribution drifts from the trained centroids, which a
periodic re-materialize repairs.

Replay safety: appends anti-join the index's id set, so a
foreachBatch replay after checkpoint recovery appends nothing; a
replay of the TRAINING batch either finds centroids already written
(-> append path -> all ids skipped) or re-runs the overwrite-mode
materialize (crash before the centroid write), both idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.similarity import (
    append_to_ivf_index,
    materialize_ivf_index,
)


def run_streaming_ivf(
    spark: SparkSession,
    stream_df: DataFrame,
    id_col: str,
    vec_col: str,
    index_path: str,
    checkpoint_path: str,
    n_cells: int = 16,
    seed: int = 7,
    train_sample: int = 100_000,
):
    """Start the stream: first trigger materializes (trains) the
    index at ``index_path``, later triggers append through the
    idempotent id anti-join."""

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        from ..storeio import read_parquet_if_exists

        cent = read_parquet_if_exists(
            spark, f"{index_path}/centroids"
        )
        if cent is None:
            materialize_ivf_index(
                batch_df,
                id_col,
                vec_col,
                index_path,
                n_cells=n_cells,
                seed=seed,
                train_sample=train_sample,
            )
        else:
            append_to_ivf_index(batch_df, id_col, vec_col, index_path)

    return (
        stream_df.writeStream.foreachBatch(handle)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )
