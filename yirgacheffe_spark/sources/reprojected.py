"""Lazy reprojection/resampling of a layer onto a new projection+pitch.

The reference warps per read window with GDAL (``_layers/reprojected.py``);
without GDAL this layer resamples analytically: for each requested target
pixel center, compute its source-CRS coordinate with the engine's closed-form
transforms, convert to source pixel indices, and gather.

Supported methods (the reference's eight, ``_layers/reprojected.py:14-46``):
``nearest`` (index gather) and ``sum``/``average``/``min``/``max``/``mode``/
``med``/``rms`` (block-stats over the source pixels mapping to each target
pixel — only for integer downscale factors on the same CRS, the common
"coarsen a raster" case).  Bilinear-family kernels are intentionally absent,
as in the reference (chunked evaluation breaks their support;
``reprojected.py:38-46``).
"""

from __future__ import annotations

from typing import Any

import numpy as np

from ..dtypes import DataType
from ..grid import MapProjection, Window
from ..reprojection import transform_point
from .base import Layer

RESAMPLING_METHODS = ("nearest", "sum", "average", "min", "max", "mode", "med", "rms")


class _ExpressionLayer(Layer):
    """Adapter presenting an expression tree as a readable layer, so any
    node — not just sources — can be reprojected (reference wraps arbitrary
    nodes the same way, ``_operators/__init__.py:422-434``).  Reads evaluate
    the subtree through the fused local kernel (operator fusion + CSE), and
    inside Spark kernels the subtree's parquet leaves use the same pruned
    per-worker dataset reads as mosaic children."""

    def __init__(self, tree):
        from ..operators import LayerOperation  # pylint: disable=C0415

        self._tree = tree if isinstance(tree, LayerOperation) else LayerOperation(tree)
        projection = self._tree.projection
        if projection is None:
            raise ValueError("Expression must carry a projection to reproject")
        area = self._tree.operation_area(projection)
        super().__init__(area, name="expr")

    @property
    def datatype(self) -> DataType:
        return self._tree.datatype

    @property
    def cse_hash(self) -> int | None:
        return self._tree.cse_hash

    def read_window(self, xoff: int, yoff: int, xsize: int, ysize: int, window: Window) -> Any:
        from ..plans.kernel import evaluate_window  # pylint: disable=C0415

        return evaluate_window(self._tree, xoff, yoff, xsize, ysize)


class ReprojectedLayer(Layer):
    def __init__(self, source, projection: MapProjection, method: str = "nearest",
                 name: str | None = None):
        if method not in RESAMPLING_METHODS:
            raise ValueError(f"Unsupported resampling method: {method}")
        if not isinstance(source, Layer):
            source = _ExpressionLayer(source)
        if source.projection is None:
            raise ValueError("Source layer must be projected")
        area = source.area.reproject(projection)
        super().__init__(area, name if name is not None else f"reproject:{source.name}")
        self._source = source
        self._method = method

    @property
    def datatype(self) -> DataType:
        return self._source.datatype

    @property
    def cse_hash(self) -> int | None:
        src = self._source.cse_hash
        if src is None:
            return None
        return hash((src, self._underlying_area, self.projection, self._method))

    def read_window(self, xoff: int, yoff: int, xsize: int, ysize: int, window: Window) -> Any:
        if xsize <= 0 or ysize <= 0:
            raise ValueError("Request dimensions must be positive and non-zero")
        target_proj = self.projection
        source_proj = self._source.projection
        assert target_proj is not None and source_proj is not None

        px0 = window.xoff + xoff
        py0 = window.yoff + yoff
        # Target pixel centers in target CRS coords.
        tx = self._underlying_area.left + (px0 + np.arange(xsize) + 0.5) * target_proj.xstep
        ty = self._underlying_area.top + (py0 + np.arange(ysize) + 0.5) * target_proj.ystep

        same_crs = source_proj.crs == target_proj.crs
        if self._method == "nearest" or not same_crs:
            if self._method != "nearest":
                raise NotImplementedError(
                    f"{self._method} resampling across CRSs is not supported; use nearest"
                )
            if same_crs:
                sx, sy = tx, ty
            else:
                # Separable transforms (lat/lng <-> mercator) let us transform
                # the two axes independently.
                sx = np.array([transform_point(target_proj.crs, source_proj.crs, x, 0.0)[0] for x in tx])
                sy = np.array([transform_point(target_proj.crs, source_proj.crs, 0.0, y)[1] for y in ty])
            src_area = self._source.area
            cols = np.floor((sx - src_area.left) / source_proj.xstep).astype(np.int64)
            rows = np.floor((sy - src_area.top) / source_proj.ystep).astype(np.int64)
            src_w, src_h = self._source.window.xsize, self._source.window.ysize
            valid_c = (cols >= 0) & (cols < src_w)
            valid_r = (rows >= 0) & (rows < src_h)
            if not (valid_r.any() and valid_c.any()):
                return np.zeros((ysize, xsize), dtype=self._source.datatype.to_numpy())
            # Read only the request's preimage bounding box, never the whole
            # source: per-tile evaluation must stay O(tile), not O(raster).
            r0 = int(rows[valid_r].min())
            r1 = int(rows[valid_r].max()) + 1
            c0 = int(cols[valid_c].min())
            c1 = int(cols[valid_c].max()) + 1
            data = np.asarray(
                self._source.read_window(c0, r0, c1 - c0, r1 - r0, self._source.window)
            )
            out = np.zeros((ysize, xsize), dtype=data.dtype)
            rr = np.clip(rows, r0, r1 - 1) - r0
            cc = np.clip(cols, c0, c1 - 1) - c0
            gathered = data[np.ix_(rr, cc)]
            mask = valid_r[:, np.newaxis] & valid_c[np.newaxis, :]
            out[mask] = gathered[mask]
            return out

        # Same-CRS block statistics for integer coarsening factors.
        fx = abs(target_proj.xstep / source_proj.xstep)
        fy = abs(target_proj.ystep / source_proj.ystep)
        if not (float(fx).is_integer() and float(fy).is_integer()):
            raise NotImplementedError(
                f"{self._method} resampling requires integer scale factors, got {fx}x{fy}"
            )
        fx, fy = int(fx), int(fy)
        src_area = self._source.area
        col0 = int(np.floor((tx[0] - 0.5 * target_proj.xstep - src_area.left) / source_proj.xstep))
        row0 = int(np.floor((ty[0] - 0.5 * target_proj.ystep - src_area.top) / source_proj.ystep))
        block = np.asarray(
            self._source.read_window(
                0, 0, xsize * fx, ysize * fy, Window(col0, row0, xsize * fx, ysize * fy)
            )
        )
        shaped = block.reshape(ysize, fy, xsize, fx)
        if self._method == "sum":
            return shaped.sum(axis=(1, 3))
        if self._method == "average":
            return shaped.mean(axis=(1, 3))
        if self._method == "min":
            return shaped.min(axis=(1, 3))
        if self._method == "max":
            return shaped.max(axis=(1, 3))
        if self._method == "med":
            return np.median(shaped, axis=(1, 3))
        if self._method == "rms":
            return np.sqrt(np.mean(np.square(shaped.astype(np.float64)), axis=(1, 3)))
        # mode: most frequent value per block (ties -> smallest value).
        flat = shaped.transpose(0, 2, 1, 3).reshape(ysize, xsize, fy * fx)
        out = np.empty((ysize, xsize), dtype=block.dtype)
        vals = np.sort(flat, axis=2)
        # Run-length trick: the longest run of equal values is the mode.
        change = np.concatenate(
            [np.ones((ysize, xsize, 1), dtype=bool), vals[:, :, 1:] != vals[:, :, :-1]], axis=2
        )
        run_ids = np.cumsum(change, axis=2)
        best_count = np.zeros((ysize, xsize), dtype=np.int64)
        out[:] = vals[:, :, 0]
        for k in range(vals.shape[2]):
            counts = np.sum(run_ids == run_ids[:, :, k : k + 1], axis=2)
            better = counts > best_count
            out = np.where(better, vals[:, :, k], out)
            best_count = np.maximum(best_count, counts)
        return out
