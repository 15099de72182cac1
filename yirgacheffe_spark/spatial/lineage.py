"""Per-partition lineage + checkpoint/resume (implemented in a later
milestone this round)."""
