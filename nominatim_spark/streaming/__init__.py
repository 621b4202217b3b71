"""Structured Streaming operators (incremental ingest paths)."""
