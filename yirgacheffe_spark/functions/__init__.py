"""Vectorized column-function library (text, hashing, embeddings) — filled in
by the text-pipeline milestones."""
