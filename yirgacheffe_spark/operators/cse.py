"""Common-subexpression elimination support.

The per-tile cache itself lives in ``plans/kernel.py`` (EvalContext); this
module exposes the plan-time analysis: which structural hashes occur often
enough to earn a cache line (reference ``_operators/cse.py:27-52``).
"""

from ..plans.kernel import collect_hash_counts


def shared_hashes(tree) -> frozenset:
    return frozenset(h for h, c in collect_hash_counts(tree).items() if c >= 2)
