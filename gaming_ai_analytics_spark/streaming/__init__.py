"""Structured Streaming ingestion of the events surface."""
