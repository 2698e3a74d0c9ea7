"""Round-9 continuation probes: the new index-served DSL shapes at
1000x documents (5M docs).

Builds an id-shifted 1000x replica of sf0.1 documents only (the other
tables are irrelevant to these ops), folds ONE shared store with the
three doc-values fields, then times each new operator against the
plain BM25 serving baseline on the same store:

  - significant_terms (its background df aggregate is the one
    index-wide pass the statistic needs — the number to watch)
  - function_score / decay (BM25 + one doc-keyed docstats join)
  - top_hits (BM25 + matched-set-sized window)
  - stats / date_histogram (matched-set aggregate)

Usage: python tools/probe_r9b.py [copies]   (default 1000)
Prints one line per op; paste into SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

STRIDE = 100_000_000


def main() -> int:
    copies = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    from pyspark.sql import functions as F

    from mongo_es_spark.operators.text import (
        bm25_over_store,
        date_histogram_over_store,
        decay_score_over_store,
        function_score_over_store,
        incremental_bm25_index,
        significant_terms_over_store,
        stats_over_store,
        top_hits_over_store,
    )
    from mongo_es_spark.session import get_spark

    spark = get_spark("probe-r9b")
    spark.sparkContext.setLogLevel("ERROR")

    src = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    k = F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("__k")
    docs = (
        src.select("*", k)
        .select(
            (F.col("doc_id") + F.col("__k").cast("long") * STRIDE).alias(
                "doc_id"
            ),
            "text",
            "lang",
            "n_chars",
        )
        .withColumn(
            "day",
            F.date_add(
                F.lit("2024-01-01").cast("date"),
                (F.col("doc_id") % 365).cast("int"),
            ),
        )
    )
    base = tempfile.mkdtemp(prefix="probe_r9b_")
    store = os.path.join(base, "bm")
    try:
        t0 = time.perf_counter()
        incremental_bm25_index(
            spark, docs, store, field_cols=["lang", "n_chars", "day"]
        ).count()
        print(
            f"fold {copies}x docs ({docs.count()} rows): "
            f"{time.perf_counter() - t0:.1f} s"
        )

        def run(label, fn, reps=2):
            best = None
            for _ in range(reps):
                t0 = time.perf_counter()
                n = fn().count()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            print(f"{label}: {best:.2f} s ({n} rows)")

        run(
            "bm25 baseline (3 terms)",
            lambda: bm25_over_store(
                spark, store, ["spark", "table", "stream"], top_k=10
            ),
        )
        run(
            "function_score log1p(n_chars)",
            lambda: function_score_over_store(
                spark, store, ["spark", "table", "stream"], "n_chars"
            ),
        )
        run(
            "decay gauss(day, 30d)",
            lambda: decay_score_over_store(
                spark,
                store,
                ["spark", "table", "stream"],
                "day",
                origin="2024-06-01",
                scale_days=30.0,
            ),
        )
        run(
            "top_hits per lang (k=3)",
            lambda: top_hits_over_store(
                spark, store, ["spark", "value"], "lang", per_group=3
            ),
        )
        run(
            "stats + cardinality",
            lambda: stats_over_store(
                spark,
                store,
                ["spark", "stream"],
                "n_chars",
                cardinality_col="lang",
            ),
        )
        run(
            "date_histogram month",
            lambda: date_histogram_over_store(
                spark, store, ["spark", "batch"], "day"
            ),
        )
        run(
            "significant_terms (bg aggregate)",
            lambda: significant_terms_over_store(
                spark, store, ["stream", "window"], size=10
            ),
        )
        from mongo_es_spark.operators.text import (
            adjacency_matrix_over_store,
            composite_agg_over_store,
            rescore_over_store,
            suggest_terms,
            term_vectors_over_store,
        )

        run(
            "composite page (2 sources)",
            lambda: composite_agg_over_store(
                spark,
                store,
                ["spark", "value"],
                [
                    ("lang", "terms", None),
                    ("n_chars", "histogram", 200.0),
                ],
                size=10,
            ),
        )
        run(
            "adjacency_matrix (3 filters)",
            lambda: adjacency_matrix_over_store(
                spark,
                store,
                {"a": ["spark"], "b": ["stream"], "c": ["window", "sort"]},
            ),
        )
        run(
            "rescore window=50 (bm25 + phrase)",
            lambda: rescore_over_store(
                spark,
                store,
                ["value", "table"],
                ["value", "table"],
                window_size=50,
                rescore_weight=0.5,
            ),
        )
        run(
            "suggest (vocab levenshtein)",
            lambda: suggest_terms(
                spark, store, ["strean", "tabel"], max_dist=2
            ),
        )
        run(
            "term_vectors (3 docs)",
            lambda: term_vectors_over_store(spark, store, [0, 1, 2]),
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
