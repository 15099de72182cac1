"""Structured-streaming ingest (the reference has no streaming operators —
SURVEY.md §2.6; this package hosts the optional streaming page-ingest path)."""
