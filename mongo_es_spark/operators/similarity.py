"""Similarity search over embedding columns.

* :func:`cosine_topk` — brute-force exact top-k: one scan, JVM-side
  dot products, ``TakeOrdered`` top-k (no full sort, no shuffle of the
  data — only k rows travel).  The correct baseline at any scale where
  a full scan is acceptable.
* :func:`ann_lsh_topk` — the scale path: hyperplane-LSH signatures
  bucket the corpus; only candidates sharing a band with the query are
  re-ranked exactly.  Approximate by design (recall < 1), so it gets a
  rows-only correctness check.

An IVF variant (k-means coarse quantizer via pyspark.ml) is the
natural next step for 100 TB — the LSH variant keeps round 1
dependency-free and deterministic.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

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
