"""Print formatted physical plans for the registry queries — evidence
that filters/projection reach the scan, joins pick the intended
strategy, and the Python boundary is where it should be.

Usage: python tools/show_plans.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

DEFAULT = [
    "scan_resume",
    "oplog_filter",
    "lookup_join",
    "cdc_compaction",
    "cdc_materialize",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "similarity_topk",
    "similarity_knn_graph",
    "text_repetition",
    "text_contamination",
    "text_domain_mix",
    "events_sessionize",
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or DEFAULT

    import __spark_entry__ as entry
    from mongo_es_spark.session import get_spark

    spark = get_spark("show-plans")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in names:
        print(f"\n{'=' * 72}\n{name}\n{'=' * 72}")
        qs[name](spark, sf_dir).explain(mode="formatted")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
