"""Fused per-tile evaluation of an expression tree.

One call evaluates the *entire* tree for one tile — operator fusion with no
intermediate materialisation, exactly like the reference's per-strip ``_eval``
(``_operators/__init__.py:855-895``) but over 2-D tiles inside an
Arrow-vectorized Spark kernel.  Includes the per-tile common-subexpression
cache: sub-trees whose structural hash occurs more than once in the plan are
computed once per (hash, request-window) and reused
(reference ``_operators/cse.py``).

This module is deliberately Spark-free: the executor calls it from
``mapInPandas`` workers, and tests call it directly on the driver as the
golden "local oracle" — the same kernel, one giant tile.
"""

from __future__ import annotations

from collections import Counter
from dataclasses import dataclass, field
from typing import Any

import numpy as np

from ..grid import Area, MapProjection
from ..operators import KERNELS, LayerConstant, LayerOperation, Op


@dataclass
class EvalContext:
    area: Area
    projection: MapProjection
    shared_hashes: frozenset
    slots: dict[int, np.ndarray] = field(default_factory=dict)
    slot_origins: dict[int, tuple[int, int]] = field(default_factory=dict)
    cache: dict = field(default_factory=dict)


def collect_hash_counts(node, counter: Counter | None = None,
                        _seen: set | None = None) -> Counter:
    """Count structural-hash occurrences across the tree; hashes seen twice or
    more become per-tile cache lines.

    Memoized by object identity so a DAG (``e = a + a; e = e + e; ...``)
    traverses in linear time instead of 2^depth paths — a revisited node
    still bumps its hash count (it IS a reuse, the whole point of CSE) but
    never recurses again."""
    if counter is None:
        counter = Counter()
    if _seen is None:
        _seen = set()
    h = node.cse_hash if not isinstance(node, LayerConstant) else None
    if h is not None:
        counter[h] += 1
    if id(node) in _seen:
        return counter
    _seen.add(id(node))
    if isinstance(node, LayerOperation):
        for child in node.children:
            collect_hash_counts(child, counter, _seen)
    return counter


def collect_leaf_paddings(node, acc: int = 0, out: dict | None = None,
                          _seen: set | None = None) -> dict:
    """Maximum accumulated conv2d halo on any root-to-leaf path, per leaf id.

    Memoized by (node identity, accumulated pad): re-entering a shared
    subtree with a pad already explored cannot change any leaf's maximum,
    so DAG traversal stays linear per distinct pad instead of exponential."""
    if out is None:
        out = {}
    if _seen is None:
        _seen = set()
    if isinstance(node, LayerOperation):
        key = (id(node), acc)
        if key in _seen:
            return out
        _seen.add(key)
        acc += node.buffer_padding
        for child in node.children:
            collect_leaf_paddings(child, acc, out, _seen)
    elif not isinstance(node, LayerConstant):
        out[id(node)] = max(out.get(id(node), 0), acc)
    return out


def collect_parquet_leaves(node, out: list | None = None,
                           _seen: set | None = None) -> list:
    """Direct ParquetRasterLayer leaves of the tree, deduplicated by identity,
    in deterministic discovery order."""
    from ..sources.parquet import ParquetRasterLayer  # pylint: disable=C0415

    if out is None:
        out = []
    if _seen is None:
        _seen = set()
    if id(node) in _seen:
        return out
    _seen.add(id(node))
    if isinstance(node, LayerOperation):
        for child in node.children:
            collect_parquet_leaves(child, out, _seen)
    elif isinstance(node, ParquetRasterLayer):
        if not any(leaf is node for leaf in out):
            out.append(node)
    return out


def eval_tree(node, ctx: EvalContext, x: int, y: int, width: int, height: int) -> Any:
    """Evaluate ``node`` for the region (x, y, width, height) of the
    computation window (pixel offsets relative to the operation area origin).

    Returns a numpy array of shape ``(height, width)`` — or ``(height, 1)``
    for broadcastable uniform layers, or a scalar for constants.
    """
    if isinstance(node, LayerConstant):
        return node.val

    node_hash = node.cse_hash
    cache_key = (node_hash, x, y, width, height) if node_hash in ctx.shared_hashes else None
    if cache_key is not None and cache_key in ctx.cache:
        return ctx.cache[cache_key]

    if isinstance(node, LayerOperation):
        pad = node.buffer_padding
        if pad:
            x, y, width, height = x - pad, y - pad, width + 2 * pad, height + 2 * pad
        lhs = eval_tree(node.lhs, ctx, x, y, width, height)
        if node.operator is None:
            result = lhs
        else:
            fn = KERNELS[node.operator]
            if node.other is not None:
                rhs = eval_tree(node.rhs, ctx, x, y, width, height)
                other = eval_tree(node.other, ctx, x, y, width, height)
                result = fn(lhs, rhs, other, **node.kwargs)
            elif node.rhs is not None:
                rhs = eval_tree(node.rhs, ctx, x, y, width, height)
                result = fn(lhs, rhs, **node.kwargs)
            else:
                result = fn(lhs, **node.kwargs)
    else:
        # A source layer.  Pre-assembled slot data (parquet leaves routed
        # through the re-tiling join) takes priority; otherwise read directly.
        slot = getattr(node, "_slot_index", None)
        if slot is not None and slot in ctx.slots:
            assembled = ctx.slots[slot]
            oy, ox = ctx.slot_origins[slot]
            result = assembled[y - oy : y - oy + height, x - ox : x - ox + width]
        else:
            result = node.read_region(ctx.area, ctx.projection, x, y, width, height)

    if cache_key is not None:
        ctx.cache[cache_key] = result
    return result


def evaluate_window(tree, x: int = 0, y: int = 0, width: int | None = None,
                    height: int | None = None) -> np.ndarray:
    """Driver-side single-tile evaluation of a whole expression — the local
    oracle used by differential tests (and handy for small rasters)."""
    root = tree if isinstance(tree, LayerOperation) else LayerOperation(tree)
    projection = root.projection
    if projection is None:
        raise ValueError("No map projection")
    area = root.operation_area(projection)
    window = root.window
    if width is None:
        width = window.xsize
    if height is None:
        height = window.ysize
    ctx = EvalContext(
        area=area,
        projection=projection,
        shared_hashes=frozenset(
            h for h, c in collect_hash_counts(root).items() if c >= 2
        ),
    )
    result = eval_tree(root, ctx, x, y, width, height)
    result = np.asarray(result)
    if result.shape != (height, width):
        result = np.broadcast_to(result, (height, width))
    return result
