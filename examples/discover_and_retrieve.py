"""Model-free corpus discovery + retrieval demo: what you can do with
a raw text corpus BEFORE any trained encoder exists.

    raw documents
      -> hash-trick embeddings        (operators/text.hash_embed)
      -> topic/domain discovery       (operators/text.topic_clusters)
      -> semantic near-dup pairs      (operators/dedup.embedding_dup_pairs)
      -> ANN retrieval over the corpus (operators/similarity.ann_ivf_topk)

Usage:
    python examples/discover_and_retrieve.py [sf_dir]

Defaults: sf_dir=/root/testdata/sf0.001.  Prints the discovered topic
table, the near-dup pair count, and a top-5 retrieval for the first
document — every stage is the same operator the oracle-checked
registry queries exercise (text_topic_clusters, dedup_text_semantic,
pipeline_text_ann).
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    import pyspark.sql.functions as F

    from mongo_es_spark.operators.dedup import embedding_dup_pairs
    from mongo_es_spark.operators.similarity import ann_ivf_topk
    from mongo_es_spark.operators.text import hash_embed, topic_clusters
    from mongo_es_spark.session import get_spark

    spark = get_spark("discover-and-retrieve")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n = docs.count()
    print(f"corpus: {n} docs from {sf_dir}")

    print("\n-- topics (hash-embed -> spherical k-means -> TF-IDF labels)")
    topics = topic_clusters(docs, "doc_id", "text", k=4).orderBy("cluster")
    for r in topics.collect():
        print(f"  cluster {r['cluster']}: {r['n_docs']:5d} docs"
              f"  [{r['top_terms_csv']}]")

    print("\n-- semantic near-dups at cosine >= 0.92 (exact, model-free)")
    emb = hash_embed(docs, "doc_id", "text", dim=32)
    pairs = embedding_dup_pairs(emb, "doc_id", "vec", threshold=0.92)
    print(f"  {pairs.count()} near-dup pairs")

    print("\n-- retrieval: IVF top-5 for the smallest doc_id")
    qid = docs.agg(F.min("doc_id")).head()[0]
    unit = hash_embed(docs, "doc_id", "text", dim=32, normalize=True)
    index = unit.select(
        F.col("doc_id").alias("vec_id"), F.col("vec").alias("embedding")
    ).localCheckpoint(eager=True)
    top = ann_ivf_topk(
        index, "vec_id", "embedding", query_id=qid, k=5, n_probe=8
    )
    for r in top.collect():
        print(f"  doc {r['vec_id']:6d}  cosine {r['score']:.6f}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
