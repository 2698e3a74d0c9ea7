"""DataFrame operators: CDC transform/compaction/lookup joins plus the
training-data extensions (dedup, similarity, text analysis,
multimodal)."""
