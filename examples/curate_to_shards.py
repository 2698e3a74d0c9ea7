"""End-to-end curation demo: the full training-data path as one run.

    raw documents
      -> PII/blocklist scrub          (operators/text.scrub_text)
      -> quality + exact + near dedup (streaming/curate.curate_batch)
      -> temperature mix + packing    (streaming/curate.rebalance)
      -> sized training shards        (operators/export.export_shards)

Usage:
    python examples/curate_to_shards.py [sf_dir] [out_dir]

Defaults: sf_dir=/root/testdata/sf0.001, out_dir=a temp dir.  Prints
per-stage counters and the shard manifest.  This is the composition a
reference user migrating a corpus pipeline would run; every stage is
the same operator the oracle-checked registry queries exercise.
"""

from __future__ import annotations

import sys
import tempfile

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(
        prefix="curated_shards_"
    )

    from mongo_es_spark.operators.export import export_shards
    from mongo_es_spark.session import get_spark
    from mongo_es_spark.sources.tables import load_table
    from mongo_es_spark.streaming.curate import curate_batch, rebalance

    spark = get_spark("curate-to-shards")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang"
    )
    state = tempfile.mkdtemp(prefix="curate_state_")
    stats = curate_batch(
        spark, docs, state, scrub_blocklist=("spam",)
    )
    print(f"curate: {stats}")

    packed = rebalance(spark, state, max_tokens=512)
    n_seq = packed.select("seq_id").distinct().count()
    print(f"rebalance: {packed.count()} docs into {n_seq} sequences")

    manifest = export_shards(
        packed, out_dir, "seq_id", rows_per_shard=200
    )
    rows = manifest.collect()
    print(f"export: {len(rows)} shards -> {out_dir}")
    for r in rows:
        print(
            f"  {r['file'].rsplit('/', 1)[-1]}: rows={r['n_rows']} "
            f"keys=[{r['min_key']}..{r['max_key']}] bytes={r['bytes']}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
