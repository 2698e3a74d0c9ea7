"""Closed-loop store maintenance: the policy layer that turns the
observability signals (:func:`~mongo_es_spark.operators.text.describe_bm25_store`,
:func:`~mongo_es_spark.operators.similarity.describe_ivf_store`) into
maintenance actions (:func:`~mongo_es_spark.operators.text.compact_bm25_store`,
:func:`~mongo_es_spark.operators.similarity.recluster_ivf_store`).

The CDC folds are deliberately append-only and batch-proportional —
they NEVER rewrite the store — which means dead weight (superseded
generations, tombstones, dead-watermarked vectors, per-batch small
files) accumulates until a vacuum pass reclaims it.  Production
search systems run exactly this loop (Elasticsearch segment merges,
Lucene's TieredMergePolicy): serving degrades gradually, a background
policy watches cheap metadata-sized counters, and triggers the heavy
pass only when thresholds trip.  ``maintain_if_needed`` is that
policy as one idempotent call a scheduler can fire after every N
batches: it reads the store's own counters (one metadata-sized
describe), compares against thresholds, runs the maintenance pass at
most once, and reports what it saw and did — so the caller's loop is
`fold; maintain_if_needed(...)` with no bookkeeping of its own.

Query results are EXACTLY unchanged by any action taken here — the
maintenance passes are pinned result-identical in their own tests;
this module's tests pin the trigger logic (fires exactly when a
threshold trips, never twice, serving equality across the fire).
"""

from __future__ import annotations

from typing import Optional


def maintain_bm25_if_needed(
    spark,
    store_path: str,
    max_dead_ratio: float = 0.2,
    max_files_per_cpu: Optional[float] = 8.0,
    target_bytes: int = 128 << 20,
    min_files: Optional[int] = None,
) -> dict:
    """Compact the BM25 store iff its counters say so.  Triggers:

    * ``dead_ratio`` — (tombstones + superseded rows) / docstats rows
      exceeds ``max_dead_ratio``: the MVCC read tax (latest-generation
      window + live postings join) is being paid on mostly-dead rows;
      compaction reclaims them AND restores the no-window fast path.
    * ``file_pressure`` — postings files exceed
      ``max_files_per_cpu × defaultParallelism``: every append is
      range-clustered only within itself, so file-level token pruning
      decays as per-batch files pile up (each spans the full token
      alphabet); the global recluster restores it.
    * ``rollup_desync`` — the store is UNMUTATED yet its tokenstats
      df rollup fails the trust check (a crash dropped a fold's
      delta, or the store predates the rollup): significant_terms is
      paying the postings-wide fallback on every query for no reason;
      compaction rebuilds the rollup.  A mutated store's stale rollup
      is expected (priced into ``dead_ratio``) and does NOT trigger.

    Returns ``{"action": "compact"|"rebuild_rollup"|"none",
    "reasons": [...], "describe": <counters>, "result": <stats or
    None>}``.  Idempotent: right after a pass the triggers read
    clear, so a second call is a no-op.

    Cost: the decision reads ``describe_bm25_store(full=False)`` —
    parquet footer counts, file listings, the one-row params (whose
    ``dead`` counter the CDC folds maintain batch-side) and the
    tokenstats marker — NEVER an index-wide pass, so wiring this
    after every micro-batch (``SearchIndexedSink(maintain=...)``)
    keeps the per-trigger cost batch-proportional.  A desync-only
    trip heals the rollup at missing-fold cost via the counted-docs
    sidecar (:func:`repair_bm25_tokenstats`), falling back to the
    vocabulary-sized rebuild only on a torn sidecar pair — never the
    whole index.
    """
    from .text import (
        compact_bm25_store,
        describe_bm25_store,
        repair_bm25_tokenstats,
    )

    d = describe_bm25_store(spark, store_path, full=False)
    if not d.get("exists"):
        return {"action": "none", "reasons": ["missing"], "describe": d,
                "result": None}
    reasons = []
    total = d.get("docstats_rows") or 0
    dead = d.get("dead_rows") or 0
    if total > 0 and dead / total > max_dead_ratio:
        reasons.append(
            f"dead_ratio {dead}/{total} > {max_dead_ratio}"
        )
    if max_files_per_cpu is not None:
        cap = max_files_per_cpu * spark.sparkContext.defaultParallelism
        if (d.get("postings_files") or 0) > cap:
            reasons.append(
                f"file_pressure {d['postings_files']} > {cap:.0f}"
            )
    desync = (
        not d.get("mutated") and not d.get("tokenstats_synced") and total
    )
    if desync:
        reasons.append(
            f"rollup_desync docs={d.get('tokenstats_docs')} "
            f"live={d.get('live_docs')}"
        )
    if not reasons:
        return {"action": "none", "reasons": [], "describe": d,
                "result": None}
    if desync and len(reasons) == 1:
        # the index itself is healthy — heal only the sidecar, at
        # missing-fold cost when the counted-docs log can name the
        # gap, postings-wide rebuild only as the torn-pair fallback
        rep = repair_bm25_tokenstats(spark, store_path)
        return {"action": "rebuild_rollup", "reasons": reasons,
                "describe": d, "result": rep}
    result = compact_bm25_store(
        spark, store_path, target_bytes=target_bytes, min_files=min_files
    )
    return {"action": "compact", "reasons": reasons, "describe": d,
            "result": result}


def maintain_ivf_if_needed(
    spark,
    path: str,
    id_col: str,
    max_dead_ratio: float = 0.2,
    n_cells: Optional[int] = None,
    seed: int = 7,
    train_sample: int = 100_000,
) -> dict:
    """Recluster the IVF store iff its counters say so.  Trigger:
    dead rows (total − live) / total exceeds ``max_dead_ratio`` — the
    same dead weight that every scan filters is also the proxy for
    centroid drift (updates land where the OLD quantizer puts them,
    inflating cellstats radii until pruning decays), and
    ``recluster_ivf_store`` repairs both in one pass.

    Returns the same shape as :func:`maintain_bm25_if_needed` with
    ``action: "recluster"`` on fire.

    Cost: two parquet footer counts — total vector rows and dead
    WATERMARK rows (each CDC mutation appends exactly one watermark
    and kills exactly one live row, so the watermark count estimates
    dead rows; re-deliveries are skipped before writing, and the
    estimate can only drift high on multi-generation kills, vacuuming
    early).  Never the vectors-wide live-resolution join the full
    :func:`describe_ivf_store` pays — safe to run per micro-batch.
    """
    from ..storeio import read_parquet_if_exists
    from .similarity import recluster_ivf_store

    vecs = read_parquet_if_exists(spark, f"{path}/vectors")
    if vecs is None:
        d = {"store": path, "exists": False}
        return {"action": "none", "reasons": ["missing"], "describe": d,
                "result": None}
    dead_df = read_parquet_if_exists(spark, f"{path}/dead")
    total = vecs.count()  # parquet footer metadata
    dead = dead_df.count() if dead_df is not None else 0
    d = {"store": path, "exists": True, "vector_rows": total,
         "dead_watermarks": dead}
    if not (total > 0 and dead / total > max_dead_ratio):
        return {"action": "none", "reasons": [], "describe": d,
                "result": None}
    reasons = [f"dead_ratio {dead}/{total} > {max_dead_ratio}"]
    result = recluster_ivf_store(
        spark, path, id_col,
        n_cells=n_cells, seed=seed, train_sample=train_sample,
    )
    return {"action": "recluster", "reasons": reasons, "describe": d,
            "result": result}


def maintain_if_needed(spark, store_path: str, **kwargs) -> dict:
    """Kind-sniffing dispatcher: a BM25 store has ``postings/``, an
    IVF store has ``vectors/`` — route to the matching policy.  IVF
    needs ``id_col`` in ``kwargs``."""
    import os

    if os.path.isdir(os.path.join(store_path, "postings")):
        return maintain_bm25_if_needed(spark, store_path, **kwargs)
    if os.path.isdir(os.path.join(store_path, "vectors")):
        return maintain_ivf_if_needed(spark, store_path, **kwargs)
    return {"action": "none", "reasons": ["unknown store kind"],
            "describe": {"store": store_path, "exists": False},
            "result": None}
