"""Similarity search over embedding columns.

* :func:`cosine_topk` — brute-force exact top-k: one scan, JVM-side
  dot products, ``TakeOrdered`` top-k (no full sort, no shuffle of the
  data — only k rows travel).  The correct baseline at any scale where
  a full scan is acceptable.
* :func:`ann_lsh_topk` — hyperplane-LSH signatures bucket the corpus;
  only candidates sharing a band with the query are re-ranked exactly.
  Approximate by design (recall < 1), so it gets a rows-only
  correctness check.
* :func:`ann_ivf_topk` — the IVF scale path: a k-means coarse
  quantizer (trained on a bounded sample, the standard IVF recipe)
  partitions the corpus into cells; queries scan only the ``n_probe``
  nearest cells.  At 100 TB the cell assignment is a one-pass
  Arrow-batched argmax against broadcast centroids, and the probed
  fraction bounds the scan.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .dedup import cosine_col, hyperplane_signature


def _query_vec(df: DataFrame, id_col: str, vec_col: str, query_id) -> DataFrame:
    return df.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).cast("array<double>").alias("qv")
    )


def cosine_topk(
    df: DataFrame, id_col: str, vec_col: str, query_id, k: int = 10
) -> DataFrame:
    """Exact top-k by cosine to the row with ``query_id``.

    The query vector joins in as a broadcast single-row frame — the
    whole computation stays in the engine (no driver collect), so the
    same plan serves parameter sweeps and batch scoring.
    """
    q = _query_vec(df, id_col, vec_col, query_id)
    vecs = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).filter(F.col(id_col) != query_id)
    scored = vecs.crossJoin(F.broadcast(q)).select(
        F.col(id_col),
        F.round(cosine_col(F.col("v"), F.col("qv")), 6).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def ann_lsh_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id,
    dims: int,
    k: int = 10,
    bits: int = 16,
    band_bits: int = 4,
) -> DataFrame:
    """Approximate top-k: candidates = rows sharing >=1 LSH band with
    the query; exact cosine re-rank on the candidate set."""
    sigs = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    ).withColumn("sig", hyperplane_signature(F.col("v"), dims, bits))
    n_bands = bits // band_bits

    def bands(col: Column) -> Column:
        return F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    (
                        F.shiftrightunsigned(col, b * band_bits)
                        % F.lit(2**band_bits)
                    ).alias("val"),
                )
                for b in range(n_bands)
            ]
        )

    banded = sigs.select(
        id_col, "v", F.explode(bands(F.col("sig"))).alias("bb")
    ).select(id_col, "v", "bb.band", "bb.val")
    qb = (
        banded.filter(F.col(id_col) == query_id)
        .select(
            F.col("band").alias("qband"),
            F.col("val").alias("qval"),
            F.col("v").alias("qv"),
        )
    )
    cands = (
        banded.filter(F.col(id_col) != query_id)
        .join(
            F.broadcast(qb),
            (F.col("band") == F.col("qband")) & (F.col("val") == F.col("qval")),
        )
        .dropDuplicates([id_col])
    )
    scored = cands.select(
        F.col(id_col),
        F.round(cosine_col(F.col("v"), F.col("qv")), 6).alias("score"),
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)


def _kmeans_fit(X: np.ndarray, n_cells: int, seed: int, iters: int = 10):
    """Lloyd's k-means on L2-normalized vectors (so euclidean argmin ==
    cosine argmax).  Deterministic: seeded init, fixed iterations."""
    rng = np.random.default_rng(seed)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    C = X[rng.choice(len(X), size=min(n_cells, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for c in range(len(C)):
            members = X[assign == c]
            if len(members):
                m = members.mean(axis=0)
                C[c] = m / max(np.linalg.norm(m), 1e-12)
    return C


def quantize_embeddings(
    df: DataFrame, id_col: str, vec_col: str
) -> DataFrame:
    """Symmetric int8 quantization: per-vector scale = max|x|/127,
    codes = round(x/scale) — 8x smaller storage than array<double>
    for ~1e-2 absolute element error, the standard first compression
    step for a corpus-scale embedding store.  Pure column expressions;
    zero-vector scale floors at 1e-30 so codes stay 0 instead of
    dividing by zero.

    Output: ``id, scale, codes array<tinyint>`` (values bounded to
    [-127, 127] by the scale); reconstruct with :func:`dequantize_col`
    (x ≈ code · scale).
    """
    v = F.col(vec_col).cast("array<double>")
    max_abs = F.array_max(F.transform(v, lambda x: F.abs(x)))
    scale = F.greatest(max_abs, F.lit(1e-30)) / F.lit(127.0)
    return df.select(
        F.col(id_col),
        scale.alias("scale"),
        F.transform(v, lambda x: F.round(x / scale).cast("tinyint")).alias(
            "codes"
        ),
    )


def dequantize_col(codes: Column, scale: Column) -> Column:
    """int8 codes + per-vector scale -> array<double> reconstruction."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def materialize_ivf_index(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    path: str,
    n_cells: int = 16,
    seed: int = 7,
    train_sample: int = 100_000,
) -> None:
    """Persist an IVF index: vectors written partitioned by their
    k-means cell (``<path>/vectors/cell=N/...``) plus the centroid
    matrix (``<path>/centroids``).  Queries then prune *files*, not
    rows — the probe filter never reads the unprobed cells' parquet.
    """
    vecs = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    sample = vecs.select("v").limit(train_sample).collect()
    X = np.asarray([r["v"] for r in sample], dtype=np.float64)
    C = _kmeans_fit(X, n_cells, seed)

    def assign_kernel(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series(np.empty(0, dtype=np.int32))
        M = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    assign = pandas_udf(assign_kernel, "int")
    (
        vecs.withColumn("cell", assign(F.col("v")))
        .write.mode("overwrite")
        .partitionBy("cell")
        .parquet(f"{path}/vectors")
    )
    spark = df.sparkSession
    spark.createDataFrame(
        [(int(i), [float(x) for x in row]) for i, row in enumerate(C)],
        "cell int, centroid array<double>",
    ).write.mode("overwrite").parquet(f"{path}/centroids")


def ann_ivf_search(
    spark,
    path: str,
    query_vec,
    id_col: str,
    k: int = 10,
    n_probe: int = 4,
) -> DataFrame:
    """Top-k over a materialized IVF index: pick the ``n_probe`` cells
    nearest the query from the stored centroids, scan ONLY those
    partitions (``PartitionFilters`` on ``cell`` — file-level
    pruning), exact cosine re-rank inside them."""
    cent = spark.read.parquet(f"{path}/centroids").collect()
    C = np.zeros((len(cent), len(cent[0]["centroid"])))
    for r in cent:
        C[r["cell"]] = r["centroid"]
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = [int(c) for c in np.argsort(-(C @ qn))[:n_probe]]

    vectors = spark.read.parquet(f"{path}/vectors").filter(
        F.col("cell").isin(probes)
    )
    q_df = spark.createDataFrame(
        [([float(x) for x in q],)], "qv array<double>"
    )
    return (
        vectors.crossJoin(F.broadcast(q_df))
        .select(
            F.col(id_col),
            F.round(cosine_col(F.col("v"), F.col("qv")), 6).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col(id_col).asc())
        .limit(k)
    )


def ann_ivf_topk(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    query_id,
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 7,
    train_sample: int = 100_000,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    ``n_cells`` k-means cells, probe the ``n_probe`` cells nearest the
    query, exact-re-rank inside them.

    Scale shape: the quantizer trains on a driver-side sample bounded
    by ``train_sample`` (how faiss and every IVF system trains coarse
    centroids); cell assignment is one Arrow-batched matmul per batch
    against broadcast centroids; the probe filter prunes the scan to
    ~n_probe/n_cells of the corpus before the top-k.
    """
    vecs = df.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("v")
    )
    sample = vecs.select("v").limit(train_sample).collect()
    X = np.asarray([r["v"] for r in sample], dtype=np.float64)
    C = _kmeans_fit(X, n_cells, seed)

    def assign_kernel(vs: pd.Series) -> pd.Series:
        if len(vs) == 0:
            return pd.Series(np.empty(0, dtype=np.int32))
        M = np.asarray([np.asarray(v, dtype=np.float64) for v in vs])
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        return pd.Series(np.argmax(M @ C.T, axis=1).astype(np.int32))

    assign = pandas_udf(assign_kernel, "int")
    celled = vecs.withColumn("cell", assign(F.col("v")))

    qrow = vecs.filter(F.col(id_col) == query_id).select("v").first()
    q = np.asarray(qrow["v"], dtype=np.float64)
    qn = q / max(np.linalg.norm(q), 1e-12)
    probes = [int(c) for c in np.argsort(-(C @ qn))[:n_probe]]

    q_df = vecs.filter(F.col(id_col) == query_id).select(
        F.col("v").alias("qv")
    )
    scored = (
        celled.filter(F.col("cell").isin(probes))
        .filter(F.col(id_col) != query_id)
        .crossJoin(F.broadcast(q_df))
        .select(
            F.col(id_col),
            F.round(cosine_col(F.col("v"), F.col("qv")), 6).alias("score"),
        )
    )
    return scored.orderBy(F.col("score").desc(), F.col(id_col).asc()).limit(k)
