"""Incremental / streaming ingestion into an existing index."""
