"""Spatial joins over cell-indexed tables (implemented in a later milestone
this round: point-in-polygon with cell-pruned candidates, kNN via cell-ring
expansion, salting for hot cells)."""
