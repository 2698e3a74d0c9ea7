"""End-to-end demo of the ES ``_search`` API executor: fold a corpus
into the incremental BM25 store, then serve real ES-shaped request
bodies against it — bool trees, aggregation forests, cursor paging,
highlight, rescore, and (with an IVF index) hybrid query+knn.

Run from the repo root::

    python3 examples/search_api_demo.py [sf_dir]

(default sf_dir /root/testdata/sf0.001 — a few seconds end to end).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from mongo_es_spark.operators.searchapi import count_api, search
    from mongo_es_spark.operators.similarity import materialize_ivf_index
    from mongo_es_spark.operators.text import incremental_bm25_index
    from mongo_es_spark.session import get_spark
    from mongo_es_spark.sources.tables import load_table

    spark = get_spark("search-api-demo")
    spark.sparkContext.setLogLevel("ERROR")

    # ---- index: fold documents (text + doc-values fields) ----------
    work = tempfile.mkdtemp(prefix="search_demo_")
    store = f"{work}/bm25"
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "text", "lang", "n_chars",
        F.col("text").alias("_source"),
    )
    incremental_bm25_index(
        spark, docs, store, field_cols=["lang", "n_chars", "_source"]
    ).count()
    print(f"indexed corpus from {sf_dir} -> {store}")

    # ---- a real bool request ---------------------------------------
    body = {
        "query": {"bool": {
            "must": [{"match": {"text": "spark stream"}}],
            "filter": [{"range": {"n_chars": {"gte": 100}}}],
            "must_not": [{"term": {"text": "slow"}}],
            "should": [{"match_phrase": {"text": "spark stream"}}],
        }},
        "size": 5,
        "fields": ["lang", "n_chars"],
    }
    print("\n_search bool body, top 5:")
    search(spark, store, body).show(truncate=False)

    print("_count of the same query:",
          count_api(spark, store, body).first()["count"])

    # ---- cursor paging ---------------------------------------------
    page1 = search(spark, store, {**body, "fields": []}).collect()
    last = page1[-1]
    print("search_after page 2 (cursor =",
          [last["score"], last["doc"]], "):")
    search(spark, store, {
        **body, "fields": [],
        "search_after": [last["score"], last["doc"]],
    }).show()

    # ---- aggregation forest (the dashboard shape) ------------------
    print("aggs forest over the hit set:")
    search(spark, store, {
        "query": {"match": {"text": "spark stream"}},
        "aggs": {
            "langs": {"terms": {"field": "lang"},
                      "aggs": {"avg_c": {"avg": {"field": "n_chars"}}}},
            "sizes": {"histogram": {"field": "n_chars",
                                    "interval": 200.0}},
        },
    }).show()

    # ---- highlight over the returned page --------------------------
    print("highlighted hits:")
    search(spark, store, {
        "query": {"match": {"text": "spark stream"}},
        "size": 3,
        "highlight": {"fields": {"_source": {}}},
    }).show(truncate=60)

    # ---- rescore: phrase precision on top of match recall ----------
    print("rescored window (match + 2x phrase):")
    search(spark, store, {
        "query": {"match": {"text": "spark stream"}},
        "size": 5,
        "rescore": {"window_size": 10, "query": {
            "rescore_query": {"match_phrase": {"text": "spark stream"}},
            "rescore_query_weight": 2.0,
        }},
    }).show()

    # ---- hybrid: query + ES-8 knn over an IVF index ----------------
    emb = load_table(spark, sf_dir, "embeddings")
    ivf = f"{work}/ivf"
    materialize_ivf_index(emb, "vec_id", "embedding", ivf, n_cells=8)
    qv = [float(x) for x in emb.filter(F.col("vec_id") == 0)
          .first()["embedding"]]
    print("hybrid query + knn (scores sum where a doc hits both):")
    search(spark, store, {
        "query": {"match": {"text": "spark stream"}},
        "knn": {"query_vector": qv, "k": 5,
                "filter": {"range": {"doc": {"gt": 0}}}},
        "size": 5,
    }, dense_store=ivf).show()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
