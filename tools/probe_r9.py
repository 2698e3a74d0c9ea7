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
        # the parallelism lever: the default byte-sized recluster can
        # concentrate a heavy token's postings into one file on a
        # small-vocabulary corpus (pruning up, per-query parallelism
        # down) — min_files spreads the (token, doc) ranges back out
        comp2_s, _ = t(
            lambda: compact_bm25_store(spark, store, min_files=256)
        )
        q()
        post2_s, rows_post2 = t(q)
        assert rows_post2 == rows_live
        print(
            f"BM25-CDC @ {n_docs} docs: fold {fold_s:.1f}s; "
            f"CDC batch {applied} ops in {cdc_s:.1f}s; "
            f"live query fast-path {fast_s:.2f}s -> mutated "
            f"{live_s:.2f}s -> post-compact {post_s:.2f}s -> "
            f"post-compact(min_files=256) {post2_s:.2f}s; "
            f"docstats rows {ds_rows_before} -> {ds_rows_after}; "
            f"compact {comp_s:.1f}s {comp}; recompact {comp2_s:.1f}s"
        )
    finally:
        shutil.rmtree(base, ignore_errors=True)

    # ---------------- probe 2: IVF drift + recluster ----------------
    # Synthetic CLUSTERED corpus (the replica embeddings are
    # unclustered — the honest negative already on record: exact IVF
    # degrades to a layout-pruned sweep there, drift or not).  2M unit
    # 2-D vectors on 64 tight arcs covering [0°,180°); the drifted
    # append adds 2M more on 64 arcs covering [180°,360°) — every
    # drifted vector is far from every trained centroid, so cellstats
    # radii inflate until pruning dies; recluster re-trains on a
    # hash-ordered (drift-covering) sample and restores it.
    from mongo_es_spark.operators.similarity import (
        append_to_ivf_index,
        ivf_exact_topk,
        materialize_ivf_index,
        recluster_ivf_store,
    )

    n_half = 2_000_000

    def arcs(base_deg: float, id_offset: int):
        ang = (
            F.radians(
                F.lit(base_deg)
                + (F.col("id") % 64) * 2.8125
                + ((F.col("id") / 64).cast("long") % 1000) * 0.0005
            )
        )
        return spark.range(n_half).select(
            (F.col("id") + id_offset).alias("vec_id"),
            F.array(F.cos(ang), F.sin(ang)).alias("v"),
        )

    base_v = arcs(0.0, 0)
    drift_v = arcs(180.0, 1_000_000_000_000)  # disjoint id space
    base2 = tempfile.mkdtemp(prefix="probe_ivf_drift_")
    path = os.path.join(base2, "ivf")
    try:
        mat_s, _ = t(
            lambda: materialize_ivf_index(
                base_v, "vec_id", "v", path, n_cells=64,
                train_sample=200_000,
            )
        )
        app_s, n_app = t(
            lambda: append_to_ivf_index(drift_v, "vec_id", "v", path)
        )
        assert n_app == n_half, n_app

        import math

        qvs = [
            [math.cos(math.radians(a)), math.sin(math.radians(a))]
            for a in (10.0, 95.0, 200.0, 310.0)
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
            lambda: recluster_ivf_store(
                spark, path, "vec_id", n_cells=128,
                train_sample=200_000,
            )
        )
        t_post, read_post, res_post = panel()
        assert res_drift == res_post  # exactness is geometry-free
        total = 2 * n_half
        print(
            f"IVF drift @ {n_half}+{n_app} clustered 2-D vectors: "
            f"materialize 64 cells {mat_s:.1f}s, drifted append "
            f"{app_s:.1f}s; 4-query exact panel reads "
            f"{read_drift} rows "
            f"({100 * read_drift / (len(qvs) * total):.0f}%/query) in "
            f"{t_drift:.1f}s drifted -> {read_post} rows "
            f"({100 * read_post / (len(qvs) * total):.1f}%/query) in "
            f"{t_post:.1f}s after recluster to 128 cells "
            f"({rec_s:.1f}s, {rec}); results identical"
        )
    finally:
        shutil.rmtree(base2, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
