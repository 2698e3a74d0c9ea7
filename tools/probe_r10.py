"""Round-10 scale probes (results recorded in SCALING.md).

1. percolate sparse fast path: 1k narrow conjunctive saved queries
   over a 5M-doc replica — query-indexed mode vs broadcast mode.
2. significant_terms served from the tokenstats rollup vs the
   postings-wide background aggregate, same 5M-doc store.
3. merge-on-read ParquetIndexSink: per-trigger apply cost as state
   grows (flat) vs rewrite mode (state-proportional).

Usage: python tools/probe_r10.py [probe ...]   (default: all)
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mongo_es_spark.session import get_spark

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WORK = "/tmp/probe_r10"


def docs_5m(spark):
    """Id-shifted 1000x replica of the sf0.1 documents (~5M rows)."""
    out = os.path.join(WORK, "docs5m")
    if not os.path.isdir(out):
        base = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text"
        )
        (
            base.crossJoin(spark.range(1000).select(F.col("id").alias("__k")))
            .select(
                (F.col("doc_id") + F.col("__k") * 100_000_000).alias(
                    "doc_id"
                ),
                "text",
            )
            .repartition(64)
            .write.mode("overwrite")
            .parquet(out)
        )
    return spark.read.parquet(out)


def t(fn):
    t0 = time.time()
    n = fn()
    return time.time() - t0, n


def probe_percolate(spark):
    """1k narrow conjunctive saved queries — the alerting shape: 990
    anchored on terms ABSENT from the corpus (a live alert that has
    not fired), 10 anchored on the rare term 'dup' (df ~5%).  Every
    query also requires two COMMON terms, which is what makes the
    broadcast plan blind: it joins every common-term posting into
    (doc, q_id) pairs before the count can reject them, while the
    indexed plan generates candidates only from each query's rarest
    term.  Broadcast is measured at the 100x control (it exhausts the
    local JVM at 1000x with 1000 queries); indexed runs both."""
    common = [
        "batch", "small", "scan", "agg", "data", "slow", "join", "big",
        "filter", "row", "table", "stream", "sort", "window", "order",
    ]
    rows = []
    for i in range(10):
        rows.append(
            (i, ["dup", common[i % 15], common[(i + 7) % 15]], True)
        )
    for i in range(10, 1000):
        rows.append(
            (i, [f"alert{i}", common[i % 15], common[(i + 7) % 15]], True)
        )
    qdf = spark.createDataFrame(
        rows, "q_id long, terms array<string>, match_all boolean"
    )
    from mongo_es_spark.operators.text import percolate

    docs5 = docs_5m(spark)
    docs500k = docs5.filter(F.col("doc_id") % 10 == 0)
    for label, docs, modes in (
        ("500k", docs500k, ("indexed", "broadcast")),
        ("5M  ", docs5, ("indexed",)),
    ):
        for mode in modes:
            sec, n = t(
                lambda: percolate(spark, qdf, docs, mode=mode).count()
            )
            print(
                f"percolate 1k-sparse {label} mode={mode:9s}: "
                f"{sec:6.1f} s rows={n}"
            )


def probe_significant(spark):
    """significant_terms at 5M docs: rollup-served vs postings-wide
    background."""
    from mongo_es_spark.operators.text import (
        incremental_bm25_index,
        significant_terms_over_store,
    )

    store = os.path.join(WORK, "bm5m")
    if not os.path.isdir(store):
        incremental_bm25_index(
            spark, docs_5m(spark), store
        ).count()
    from mongo_es_spark.operators.text import bm25_over_store

    # serving floor FIRST — it doubles as JVM/codegen warmup so the
    # two significant_terms timings compare like for like
    sec, n = t(
        lambda: bm25_over_store(spark, store, ["dup"], top_k=10).count()
    )
    print(f"bm25 serving floor              : {sec:6.1f} s rows={n}")
    sec, n = t(
        lambda: significant_terms_over_store(
            spark, store, ["dup"], size=10
        ).count()
    )
    print(f"significant_terms rollup-served : {sec:6.1f} s rows={n}")
    ts = os.path.join(store, "tokenstats")
    saved = os.path.join(WORK, "tokenstats_saved")
    shutil.move(ts, saved)
    try:
        sec, n = t(
            lambda: significant_terms_over_store(
                spark, store, ["dup"], size=10
            ).count()
        )
        print(f"significant_terms postings-wide : {sec:6.1f} s rows={n}")
    finally:
        shutil.move(saved, ts)


def probe_merge_sink(spark):
    """Per-trigger apply cost as keyed state grows: merge mode must be
    flat, rewrite mode grows with state."""
    from mongo_es_spark.streaming.sink import ParquetIndexSink

    def batch(lo, n, tag):
        return spark.range(lo, lo + n).select(
            F.lit("upsert").alias("action"),
            F.col("id").cast("string").alias("id"),
            F.lit(None).cast("string").alias("parent"),
            F.struct(
                F.concat(F.lit(tag), F.col("id")).alias("name")
            ).alias("data"),
            F.lit(0).cast("long").alias("timestamp"),
        )

    n_batch = 50_000
    for mode in ("merge", "rewrite"):
        path = os.path.join(WORK, f"sink_{mode}")
        shutil.rmtree(path, ignore_errors=True)
        sink = ParquetIndexSink(path, mode=mode)
        # seed 1M rows of state
        for b in range(4):
            sink.apply(spark, batch(b * 250_000, 250_000, "seed"), b)
        times = []
        for b in range(4, 7):
            sec, _ = t(
                lambda b=b: sink.apply(
                    spark, batch(10_000_000 + b * n_batch, n_batch, "t"), b
                )
                or 0
            )
            times.append(sec)
        state_n = sink.read_state(spark).count()
        print(
            f"sink mode={mode:8s} 1M-state {n_batch}-row triggers: "
            + " ".join(f"{s:5.2f}s" for s in times)
            + f"  (state={state_n})"
        )


def probe_wave6(spark):
    """Round-10 serving ops at 5M docs over a stored-fields index:
    every one should sit at or under the token-pruned serving floor
    (they share its matched-docs head and add only doc-values work)."""
    from mongo_es_spark.operators.text import (
        bm25_over_store,
        filters_agg_over_store,
        geo_bbox_over_store,
        geo_distance_over_store,
        incremental_bm25_index,
        match_phrase_prefix_over_store,
        multi_terms_over_store,
        percentiles_over_store,
        range_agg_over_store,
        rare_terms_over_store,
        span_first_over_store,
        terms_set_over_store,
    )

    store = os.path.join(WORK, "bm5mf")
    if not os.path.isdir(store):
        base = spark.read.parquet(f"{SF}/documents.parquet").select(
            "doc_id", "text", "lang", "n_chars"
        )
        docs = (
            base.crossJoin(
                spark.range(1000).select(F.col("id").alias("__k"))
            )
            .select(
                (F.col("doc_id") + F.col("__k") * 100_000_000).alias(
                    "doc_id"
                ),
                "text", "lang", "n_chars",
            )
            .withColumn(
                "lat",
                ((F.col("doc_id") % 180) - 90 + F.lit(0.5)).cast(
                    "double"
                ),
            )
            .withColumn(
                "lon",
                ((F.col("doc_id") * 7 % 360) - 180 + F.lit(0.5)).cast(
                    "double"
                ),
            )
            .repartition(64)
        )
        incremental_bm25_index(
            spark, docs, store,
            field_cols=["lang", "n_chars", "lat", "lon"],
        ).count()
    terms = ["dup", "batch"]
    runs = [
        ("bm25 floor", lambda: bm25_over_store(
            spark, store, terms, top_k=10).count()),
        ("range_agg", lambda: range_agg_over_store(
            spark, store, terms, "n_chars",
            [(None, 200), (200, 400), (400, None)]).count()),
        ("filters_agg", lambda: filters_agg_over_store(
            spark, store, terms,
            {"en": F.col("lang") == "en",
             "long": F.col("n_chars") >= 300}).count()),
        ("multi_terms", lambda: multi_terms_over_store(
            spark, store, terms, ["lang"], size=8).count()),
        ("rare_terms", lambda: rare_terms_over_store(
            spark, store, max_doc_count=300_000).count()),
        ("percentiles", lambda: percentiles_over_store(
            spark, store, terms, "n_chars").count()),
        ("geo_distance", lambda: geo_distance_over_store(
            spark, store, terms, 10.5, 20.5, 3000.0).count()),
        ("geo_bbox", lambda: geo_bbox_over_store(
            spark, store, terms, -20.0, 40.0, -60.0, 60.0).count()),
        ("terms_set", lambda: terms_set_over_store(
            spark, store, ["dup", "batch", "scan", "data"], 3).count()),
        ("span_first", lambda: span_first_over_store(
            spark, store, "dup", 3).count()),
        ("phrase_prefix", lambda: match_phrase_prefix_over_store(
            spark, store, ["dup"], "s").count()),
    ]
    for name, fn in runs:
        sec, n = t(fn)
        print(f"wave6 {name:14s}: {sec:6.1f} s rows={n}")


PROBES = {
    "percolate": probe_percolate,
    "significant": probe_significant,
    "sink": probe_merge_sink,
    "wave6": probe_wave6,
}


def main() -> int:
    spark = get_spark("probe-r10")
    os.makedirs(WORK, exist_ok=True)
    names = sys.argv[1:] or list(PROBES)
    for name in names:
        PROBES[name](spark)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
