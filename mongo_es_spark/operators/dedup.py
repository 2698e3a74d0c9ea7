"""Deduplication operators for training-data pipelines.

No reference counterpart (SURVEY §7 step 9 north-star extensions) —
designed Spark-first for the 100 TB case:

* exact:   hash-groupBy; one shuffle with map-side partial aggregation.
* n-gram Jaccard: shingle inverted index + equi-join; a ``max_df``
  stop-shingle cap bounds the quadratic blowup of hot shingles (the
  classic skew guard — a shingle appearing in f docs contributes
  f^2 candidate pairs).
* MinHash + LSH: signature -> banded bucket join -> candidates ->
  EXACT Jaccard verification.  Verification makes the operator's
  output exact (equal to the brute-force pairs) with probability
  1-(1-t^r)^b of recalling a pair at threshold t; the bucket join
  replaces the all-pairs O(n^2) with near-linear work.
* SimHash: 64-bit signature, Hamming<=k pairs via the pigeonhole
  band join (k<=3 -> one of four 16-bit chunks must match exactly).
* embedding cosine: exact all-pairs baseline (JVM-side zip_with dot
  product) + hyperplane-LSH bucketed variant as the scale path.

Everything is built-in column expressions — no Python in the hot path.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# ------------------------------------------------------------------ #
# shingling
# ------------------------------------------------------------------ #

def tokens_col(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles_col(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array column (JVM-side)."""
    words = tokens_col(text)
    count = F.size(words) - (n - 1)
    return F.when(count >= 1, F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), count),
            lambda i: F.concat_ws(" ", F.slice(words, i, n)),
        )
    )).otherwise(F.array().cast("array<string>"))


# ------------------------------------------------------------------ #
# exact dedup
# ------------------------------------------------------------------ #

def exact_dedup(
    df: DataFrame, key_cols: Sequence[str], id_col: str
) -> DataFrame:
    """Keep the minimum id per duplicate group.  ``groupBy().min()``
    compiles to partial+final hash aggregation — one shuffle, map-side
    combined, no row_number sort needed."""
    return df.groupBy(*key_cols).agg(F.min(id_col).alias(id_col))


# ------------------------------------------------------------------ #
# n-gram Jaccard (brute, via inverted index)
# ------------------------------------------------------------------ #

def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    max_df: Optional[int] = None,
) -> DataFrame:
    """All pairs (i < j) with shingle-set Jaccard >= threshold.

    Output: ``i, j, jaccard`` (rounded to 6 dp).  ``max_df`` drops
    shingles occurring in more than that many documents before the
    self-join — at scale hot shingles dominate the candidate count
    quadratically while contributing mostly low-Jaccard noise.
    """
    sh = df.select(
        F.col(id_col).alias("doc"),
        F.explode(shingles_col(F.col(text_col), n)).alias("s"),
    )
    if max_df is not None:
        hot = (
            sh.groupBy("s").count().filter(F.col("count") > max_df).select("s")
        )
        sh = sh.join(hot, "s", "left_anti")
    counts = sh.groupBy("doc").agg(F.count("*").alias("n_sh"))
    a, b = sh.alias("a"), sh.alias("b")
    shared = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("i"), F.col("b.doc").alias("j"))
        .agg(F.count("*").alias("shared"))
    )
    ca = counts.select(F.col("doc").alias("i"), F.col("n_sh").alias("ni"))
    cb = counts.select(F.col("doc").alias("j"), F.col("n_sh").alias("nj"))
    jac = F.col("shared") / (F.col("ni") + F.col("nj") - F.col("shared"))
    return (
        shared.join(ca, "i").join(cb, "j")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("i", "j", "jaccard")
    )


# ------------------------------------------------------------------ #
# MinHash + LSH
# ------------------------------------------------------------------ #

def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = 3,
    threshold: float = 0.8,
    num_hashes: int = 32,
    bands: int = 16,
) -> DataFrame:
    """LSH-accelerated near-duplicate pairs, exact-verified.

    Pipeline: shingle -> minhash signature (xxhash64 per seed, JVM) ->
    band buckets -> bucket equi-join for candidates -> fetch shingle
    arrays -> exact Jaccard filter.  Output identical to
    :func:`jaccard_pairs` when recall holds (rows = bands/num_hashes
    per band; miss probability (1-t^r)^b).
    """
    rows = num_hashes // bands
    docs = df.select(
        F.col(id_col).alias("doc"),
        shingles_col(F.col(text_col), n).alias("sh"),
    ).filter(F.size("sh") > 0)

    def _seeded(seed: int):
        # NB: a `lambda s, seed=h:` default-arg closure would change
        # the visible arity and break PySpark's lambda introspection
        return lambda s: F.xxhash64(s, F.lit(seed))

    sig_cols = [
        F.array_min(F.transform(F.col("sh"), _seeded(h))).alias(f"mh{h}")
        for h in range(num_hashes)
    ]
    signed = docs.select("doc", "sh", *sig_cols)

    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(*[F.col(f"mh{b * rows + r}") for r in range(rows)]).alias(
                "bucket"
            ),
        )
        for b in range(bands)
    ]
    banded = signed.select(
        "doc", "sh", F.explode(F.array(*band_structs)).alias("bb")
    ).select("doc", "sh", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))

    a, b_ = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b_,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("i"),
            F.col("b.doc").alias("j"),
            F.col("a.sh").alias("sh_i"),
            F.col("b.sh").alias("sh_j"),
        )
        .dropDuplicates(["i", "j"])
    )
    inter = F.size(F.array_intersect("sh_i", "sh_j"))
    union = F.size(F.array_union("sh_i", "sh_j"))
    return (
        cands.withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("i", "j", "jaccard")
    )


# ------------------------------------------------------------------ #
# SimHash
# ------------------------------------------------------------------ #

def simhash_chunks_col(text: Column) -> Column:
    """64-bit SimHash as an array of four 16-bit chunks.

    One JVM pass over the tokens accumulates the 64 per-bit majority
    votes as an int array (``aggregate`` + ``zip_with``); chunk
    assembly stays in 16-bit ints, which is both ANSI-overflow-safe
    and exactly the representation the pigeonhole band join wants.
    """
    toks = F.array_distinct(tokens_col(text))
    votes = F.aggregate(
        F.transform(toks, lambda t: F.xxhash64(t)),
        F.array_repeat(F.lit(0), 64),
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    (F.shiftrightunsigned(h, i) % 2 * 2 - 1).cast("int")
                    for i in range(64)
                ]
            ),
            lambda a, b: a + b,
        ),
    )

    def chunk(c: int) -> Column:
        sixteen = F.slice(votes, 16 * c + 1, 16)
        pw = F.sequence(F.lit(0), F.lit(15))
        return F.aggregate(
            F.zip_with(
                sixteen,
                pw,
                lambda v, i: F.when(
                    v > 0, F.pow(F.lit(2.0), i).cast("int")
                ).otherwise(F.lit(0)),
            ),
            F.lit(0),
            lambda acc, x: acc + x,
        )

    return F.array(*[chunk(c) for c in range(4)])


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 3
) -> DataFrame:
    """Pairs with SimHash Hamming distance <= ``max_hamming`` (<= 3).

    Pigeonhole: at distance <=3, at least one of the four 16-bit chunks
    is identical — the chunk equi-join prunes the quadratic space, then
    per-chunk ``bit_count(xor)`` verifies exactly.  Signature-dependent,
    hence no cross-engine oracle (rows-only check).
    """
    sims = df.select(
        F.col(id_col).alias("doc"),
        simhash_chunks_col(F.col(text_col)).alias("sim"),
    )
    chunks = sims.select(
        "doc",
        "sim",
        F.posexplode(F.col("sim")).alias("chunk", "val"),
    )
    a, b = chunks.alias("a"), chunks.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("i"),
            F.col("b.doc").alias("j"),
            F.col("a.sim").alias("sim_i"),
            F.col("b.sim").alias("sim_j"),
        )
        .dropDuplicates(["i", "j"])
    )
    hamming = F.aggregate(
        F.zip_with(
            F.col("sim_i"),
            F.col("sim_j"),
            lambda x, y: F.bit_count(x.bitwiseXOR(y)),
        ),
        F.lit(0),
        lambda acc, x: acc + x.cast("int"),
    )
    return (
        cands.withColumn("hamming", hamming)
        .filter(F.col("hamming") <= max_hamming)
        .select("i", "j", "hamming")
    )


# ------------------------------------------------------------------ #
# embedding cosine near-dup
# ------------------------------------------------------------------ #

def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_col(a: Column, b: Column) -> Column:
    """Cosine similarity of two double-array columns, all JVM-side."""
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def embedding_dup_pairs(
    df: DataFrame, id_col: str, vec_col: str, threshold: float = 0.45
) -> DataFrame:
    """Exact all-pairs cosine near-duplicates (the baseline).

    O(n^2) by construction — correct reference output for the LSH
    variant; at scale use :func:`embedding_dup_pairs_lsh`.
    """
    vecs = df.select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).cast("array<double>").alias("v"),
    )
    a, b = vecs.alias("a"), vecs.alias("b")
    pairs = a.join(b, F.col("a.doc") < F.col("b.doc"))
    cos = cosine_col(F.col("a.v"), F.col("b.v"))
    return (
        pairs.select(
            F.col("a.doc").alias("i"),
            F.col("b.doc").alias("j"),
            F.round(cos, 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )


def hyperplane_signature(vec: Column, dims: int, bits: int = 16) -> Column:
    """Deterministic random-hyperplane LSH signature: hyperplane
    weights are +-1 derived from xxhash64(bit, dim) — reproducible
    across runs with zero driver-side state."""
    def _signed_weight(b: int):
        return lambda x, d: x * (
            F.xxhash64(F.lit(b), d) % 2 * 2 - 1
        ).cast("double")

    out = F.lit(0).cast("long")
    for bit in range(bits):
        proj = F.aggregate(
            F.zip_with(
                vec, F.sequence(F.lit(0), F.lit(dims - 1)), _signed_weight(bit)
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        out = out + F.when(proj > 0, F.lit(2**bit).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return out


def embedding_dup_pairs_lsh(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dims: int,
    threshold: float = 0.45,
    bits: int = 16,
    band_bits: int = 4,
) -> DataFrame:
    """Scale path: hyperplane-LSH bucket join + exact cosine verify.
    Recall < 1 by design (approximate); candidates only form within
    matching sign-bands."""
    vecs = df.select(
        F.col(id_col).alias("doc"),
        F.col(vec_col).cast("array<double>").alias("v"),
    ).withColumn("sig", hyperplane_signature(F.col("v"), dims, bits))
    n_bands = bits // band_bits
    banded = vecs.select(
        "doc",
        "v",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        (
                            F.shiftrightunsigned(F.col("sig"), b * band_bits)
                            % F.lit(2**band_bits)
                        ).alias("val"),
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("bb"),
    ).select("doc", "v", "bb.band", "bb.val")
    a, b = banded.alias("a"), banded.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc") < F.col("b.doc")),
        )
        .select(
            F.col("a.doc").alias("i"),
            F.col("b.doc").alias("j"),
            F.col("a.v").alias("vi"),
            F.col("b.v").alias("vj"),
        )
        .dropDuplicates(["i", "j"])
    )
    cos = cosine_col(F.col("vi"), F.col("vj"))
    return (
        cands.withColumn("cosine", F.round(cos, 6))
        .filter(F.col("cosine") >= threshold)
        .select("i", "j", "cosine")
    )
