"""Dataflow operators: dedup, similarity search, top-k, ranking metrics."""
