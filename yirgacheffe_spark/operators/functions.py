"""Module-level expression builders (`yg.where(...)`, `yg.sum([...])`, ...).

Mirrors the reference's public function surface
(``yirgacheffe/_operators/functions.py:7-367``).  N-ary combinators build a
*balanced* reduction tree, which keeps float association order stable and the
tree shallow — kept for bit-exact parity (``functions.py:69-77``).
"""

from __future__ import annotations

import operator as pyoperator

from . import LayerOperation, Op, WindowOp


def where(cond, a, b):
    """Element-wise ``a if cond else b`` (numpy.where semantics)."""
    return LayerOperation(cond, Op.WHERE, rhs=a, other=b)


def maximum(a, b):
    return LayerOperation(a, Op.MAXIMUM, b, window_op=WindowOp.UNION)


def minimum(a, b):
    return LayerOperation(a, Op.MINIMUM, rhs=b, window_op=WindowOp.UNION)


def _balanced_reduce(layers, operator):
    if len(layers) == 0:
        raise RuntimeError("Internal precondition violation")
    if len(layers) == 1:
        return layers[0]
    mid = len(layers) // 2
    return operator(_balanced_reduce(layers[:mid], operator), _balanced_reduce(layers[mid:], operator))


def sum(layers: list):  # pylint: disable=W0622
    """Pixel-wise sum across many layers (e.g. stacking habitat rasters)."""
    if len(layers) == 0:
        raise ValueError("List of layers is empty")
    return _balanced_reduce(list(layers), pyoperator.add)


def any(layers: list):  # pylint: disable=W0622
    """Pixel-wise 1 where any input layer is non-zero."""
    if len(layers) == 0:
        raise ValueError("List of layers is empty")
    return _balanced_reduce([layer != 0 for layer in layers], pyoperator.or_)


def all(layers: list):  # pylint: disable=W0622
    """Pixel-wise 1 where every input layer is non-zero."""
    if len(layers) == 0:
        raise ValueError("List of layers is empty")
    return _balanced_reduce([layer != 0 for layer in layers], pyoperator.and_)


def clip(layer, min=None, max=None):  # pylint: disable=W0622
    return layer.clip(min, max)


def log(layer):
    return layer.log()


def log2(layer):
    return layer.log2()


def log10(layer):
    return layer.log10()


def exp(layer):
    return layer.exp()


def exp2(layer):
    return layer.exp2()


def nan_to_num(layer, nan=0, posinf=None, neginf=None):
    return layer.nan_to_num(nan, posinf, neginf)


def isin(layer, test_elements):
    return layer.isin(test_elements)


def abs(layer):  # pylint: disable=W0622
    return layer.abs()


def floor(layer):
    return layer.floor()


def round(layer):  # pylint: disable=W0622
    return layer.round()


def ceil(layer):
    return layer.ceil()


def logical_and(layer1, layer2):
    return layer1.logical_and(layer2)


def logical_or(layer1, layer2):
    return layer1.logical_or(layer2)


def logical_xor(layer1, layer2):
    return layer1.logical_xor(layer2)


def logical_not(layer):
    return layer.logical_not()
