"""Structured Streaming pipelines (:mod:`.pipeline`) — watermarked window
aggregations, streaming dedup, and applyInPandasWithState operators, each
verified equal to its batch twin on bounded input."""
