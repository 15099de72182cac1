"""Training-data pipeline operators (dedup, quality, ANN) — filled in by the
text-pipeline milestones."""
