"""Structured-Streaming CDC core: change-log tail → LWW MERGE upsert."""
