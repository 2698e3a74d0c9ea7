"""Round-9 scale probes for SCALING.md:

1. BM25 CDC serving cost at 500k docs (/tmp/sf100): fold, mutate
   (5% updates + 2% deletes), query on the fast path / live-filter
   path / post-compaction path; docstats row reclaim.
2. IVF drift + recluster at 200k + 200k vectors: materialize on the
   original embeddings, append a NEGATED id-shifted copy (maximal
   drift — opposite hemisphere), measure exact-search rows-read and
   wall time for a query panel, recluster, re-measure; equality
   asserted at every step.

Usage: python tools/probe_r9.py [replica_dir]   (default /tmp/sf100)
Prints one observation block per probe; paste into SCALING.md.
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")


def t(fn):
    t0 = time.perf_counter()
    out = fn()
    return time.perf_counter() - t0, out


def main() -> int:
    rep = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf100"
    from pyspark.sql import functions as F

    from mongo_es_spark.session import get_spark

    spark = get_spark("probe-r9")
    spark.sparkContext.setLogLevel("ERROR")

    # ---------------- probe 1: BM25 CDC serving ----------------
    from mongo_es_spark.operators.text import (
        apply_cdc_to_bm25_index,
        bm25_over_store,
        compact_bm25_store,
        incremental_bm25_index,
    )

    docs = spark.read.parquet(os.path.join(rep, "documents.parquet"))
    n_docs = docs.count()
    base = tempfile.mkdtemp(prefix="probe_bm_cdc_")
    store = os.path.join(base, "bm")
    try:
        fold_s, _ = t(
            lambda: incremental_bm25_index(spark, docs, store).count()
        )

        def q():
            return bm25_over_store(
                spark, store, ["spark", "table", "stream"], top_k=10
            ).collect()

        q()  # warm
        fast_s, rows_fast = t(q)

        upd = docs.filter(F.col("doc_id") % 20 == 3).select(
            "doc_id",
            F.lit("u").alias("op"),
            F.concat(F.lit("updated "), F.col("text")).alias("text"),
        )
        dels = docs.filter(F.col("doc_id") % 50 == 7).select(
            "doc_id",
            F.lit("d").alias("op"),
            F.lit(None).cast("string").alias("text"),
        )
        cdc = upd.unionByName(dels)
        cdc_s, applied = t(
            lambda: apply_cdc_to_bm25_index(spark, cdc, store).count()
        )
        q()  # warm the live-filter plan
        live_s, rows_live = t(q)
        ds_rows_before = spark.read.parquet(f"{store}/docstats").count()
        comp_s, comp = t(lambda: compact_bm25_store(spark, store))
        ds_rows_after = spark.read.parquet(f"{store}/docstats").count()
        q()
        post_s, rows_post = t(q)
        assert rows_live == rows_post  # reclaim never moves results
        print(
            f"BM25-CDC @ {n_docs} docs: fold {fold_s:.1f}s; "
            f"CDC batch {applied} ops in {cdc_s:.1f}s; "
            f"live query fast-path {fast_s:.2f}s -> mutated "
            f"{live_s:.2f}s -> post-compact {post_s:.2f}s; "
            f"docstats rows {ds_rows_before} -> {ds_rows_after}; "
            f"compact {comp_s:.1f}s {comp}"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # ---------------- probe 2: IVF drift + recluster ----------------
    import numpy as np

    from mongo_es_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_exact_topk,
        materialize_ivf_index,
        recluster_ivf_store,
    )

    emb = spark.read.parquet(os.path.join(rep, "embeddings.parquet"))
    n_vec = emb.count()
    base2 = tempfile.mkdtemp(prefix="probe_ivf_drift_")
    path = os.path.join(base2, "ivf")
    try:
        mat_s, _ = t(
            lambda: materialize_ivf_index(
                emb, "vec_id", "embedding", path, n_cells=64
            )
        )
        # maximal drift: the negated corpus (opposite hemisphere, ids
        # shifted) — every appended vector is far from every trained
        # centroid, so its residual inflates whichever cell it joins
        drifted = emb.select(
            (F.col("vec_id") + 1_000_000_000).alias("vec_id"),
            F.transform(
                F.col("embedding").cast("array<double>"), lambda x: -x
            ).alias("embedding"),
        )
        app_s, n_app = t(
            lambda: append_to_ivf_index(drifted, "vec_id", "embedding", path)
        )

        qvs = [
            r["embedding"]
            for r in emb.filter(F.col("vec_id").isin([0, 17, 4242]))
            .orderBy("vec_id")
            .collect()
        ] + [
            [-float(x) for x in r["embedding"]]
            for r in emb.filter(F.col("vec_id") == 99).collect()
        ]

        def panel():
            sizes = {
                r["cell"]: r["n"]
                for r in spark.read.parquet(f"{path}/vectors")
                .groupBy("cell")
                .agg(F.count("*").alias("n"))
                .collect()
            }
            read, results, t0 = 0, [], time.perf_counter()
            for qv in qvs:
                log: list = []
                results.append(
                    [
                        (r["vec_id"], r["score"])
                        for r in ivf_exact_topk(
                            spark, path, qv, "vec_id", k=10, probe_log=log
                        ).collect()
                    ]
                )
                read += sum(
                    sizes.get(c, 0)
                    for c in log[0]["wave1"] + log[0]["wave2"]
                )
            return time.perf_counter() - t0, read, results

        panel()  # warm
        t_drift, read_drift, res_drift = panel()
        rec_s, rec = t(
            lambda: recluster_ivf_store(spark, path, "vec_id", n_cells=64)
        )
        t_post, read_post, res_post = panel()
        assert res_drift == res_post  # exactness is geometry-free
        total = 2 * n_vec
        print(
            f"IVF drift @ {n_vec}+{n_app} vectors, 64 cells: "
            f"materialize {mat_s:.1f}s, drifted append {app_s:.1f}s; "
            f"4-query exact panel reads {read_drift}/{total} rows "
            f"({100 * read_drift / (len(qvs) * total):.0f}%/query) in "
            f"{t_drift:.1f}s drifted -> {read_post}/{total} rows "
            f"({100 * read_post / (len(qvs) * total):.0f}%/query) in "
            f"{t_post:.1f}s after recluster ({rec_s:.1f}s, {rec}); "
            f"results identical"
        )
    finally:
        shutil.rmtree(base2, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
