"""The tail phase: Structured Streaming query, per-batch dispatch
plan, sinks, checkpointing."""
