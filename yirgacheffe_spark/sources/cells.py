"""Rasterize one spatial-index cell as a 1.0/0.0 mask layer.

The analog of the reference's ``H3CellLayer`` (``_layers/h3layer.py:18-235``):
the layer's extent is the cell's bounds snapped outward to the pixel grid,
and a pixel is 1.0 when its center falls inside the cell.  Because this
engine's cells are exact lat/lng rectangles (see ``spatial/cells.py``), the
authoritative per-pixel membership test *is* the closed-form bounds check —
the reference's scanline-vs-naive differential test becomes
mask-vs-independent-bbox-check here, and the tessellation invariants
(neighbors never double-fill; disk of cells sums to exact coverage) hold
bit-exactly.
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from ..dtypes import DataType
from ..grid import Area, MapProjection, Window
from ..spatial import cells as cellindex
from .base import Layer, stable_hash


class CellLayer(Layer):
    def __init__(self, cell_id: int, projection: MapProjection, name: str | None = None):
        if not projection.crs.is_geographic:
            raise ValueError("CellLayer requires a geographic (degree) projection")
        south, west, north, east = (float(v) for v in cellindex.cell_bounds(cell_id))
        sx, sy = abs(projection.xstep), abs(projection.ystep)
        area = Area(
            left=math.floor(west / sx) * sx,
            top=math.ceil(north / sy) * sy,
            right=math.ceil(east / sx) * sx,
            bottom=math.floor(south / sy) * sy,
            projection=projection,
        )
        super().__init__(area, name if name is not None else f"cell:{cell_id}")
        self.cell_id = int(cell_id)
        self._bounds = (south, west, north, east)

    @property
    def datatype(self) -> DataType:
        return DataType.Float64

    @property
    def cse_hash(self) -> int | None:
        return stable_hash("cell", self.cell_id, self._underlying_area,
                           self.projection)

    def read_window(self, xoff: int, yoff: int, xsize: int, ysize: int, window: Window) -> Any:
        if xsize <= 0 or ysize <= 0:
            raise ValueError("Request dimensions must be positive and non-zero")
        projection = self.projection
        assert projection is not None
        south, west, north, east = self._bounds
        px0 = window.xoff + xoff
        py0 = window.yoff + yoff
        # Pixel-center coordinates of the requested region.
        lngs = self._underlying_area.left + (px0 + np.arange(xsize) + 0.5) * projection.xstep
        lats = self._underlying_area.top + (py0 + np.arange(ysize) + 0.5) * projection.ystep
        # Half-open membership mirrors latlng_to_cell: west <= lng < east,
        # south < lat <= north, so adjacent cells never double-claim a pixel.
        in_lng = (lngs >= west) & (lngs < east)
        in_lat = (lats > south) & (lats <= north)
        return (in_lat[:, np.newaxis] & in_lng[np.newaxis, :]).astype(np.float64)


class S2CellLayer(Layer):
    """Rasterize one GENUINE S2 cell (``spatial/s2.py``) as a 1.0/0.0 mask.

    Membership is the exact index test — a pixel is 1.0 iff
    ``s2.latlng_to_cell(center, level)`` returns this cell's id — so the
    tessellation invariants (neighbors never double-claim a pixel; the
    four children exactly tile the parent) hold bit-exactly, the same
    guarantee CellLayer gives for the engine index.

    The layer extent is a CONSERVATIVE lat/lng bound of the (geodesic
    quadrilateral) cell: the boundary is sampled densely in uv space and
    padded by the sample spacing; pole-containing cells take the full
    longitude span.  Cells crossing the antimeridian (without containing
    a pole) are refused loudly — Area is a single [-180, 180] box.
    """

    _EDGE_SAMPLES = 256

    def __init__(self, cell_id: int, projection: MapProjection,
                 name: str | None = None):
        if not projection.crs.is_geographic:
            raise ValueError("S2CellLayer requires a geographic projection")
        from ..spatial import s2 as s2index

        # NB: never store the module on self — the layer object is shipped
        # to executors inside the kernel closure, and modules don't pickle.
        self.cell_id = int(cell_id)
        self.level = int(s2index.cell_level(np.array([cell_id]))[0])
        south, west, north, east = self._latlng_bounds(cell_id)
        sx, sy = abs(projection.xstep), abs(projection.ystep)
        area = Area(
            left=math.floor(west / sx) * sx,
            top=min(90.0, math.ceil(north / sy) * sy),
            right=math.ceil(east / sx) * sx,
            bottom=max(-90.0, math.floor(south / sy) * sy),
            projection=projection,
        )
        super().__init__(area, name if name is not None else f"s2:{cell_id}")

    def _latlng_bounds(self, cell_id: int) -> tuple[float, float, float, float]:
        from ..spatial import s2  # pylint: disable=C0415

        face, i, j = (int(v[0]) for v in s2._to_face_ij(np.array([cell_id])))
        size = 1 << (s2.MAX_LEVEL - self.level)
        # _to_face_ij returns a leaf position INSIDE the cell (the id's
        # curve position), not the min corner — snap down to the cell's
        # ij origin before building the uv rectangle.
        i, j = i & ~(size - 1), j & ~(size - 1)
        scale = 1.0 / (1 << s2.MAX_LEVEL)
        u_lo, u_hi = s2.st_to_uv(i * scale), s2.st_to_uv((i + size) * scale)
        v_lo, v_hi = s2.st_to_uv(j * scale), s2.st_to_uv((j + size) * scale)
        t = np.linspace(0.0, 1.0, self._EDGE_SAMPLES)
        us = np.concatenate([
            u_lo + (u_hi - u_lo) * t, np.full_like(t, u_hi),
            u_hi + (u_lo - u_hi) * t, np.full_like(t, u_lo)])
        vs = np.concatenate([
            np.full_like(t, v_lo), v_lo + (v_hi - v_lo) * t,
            np.full_like(t, v_hi), v_hi + (v_lo - v_hi) * t])
        x, y, z = s2._face_uv_to_xyz(np.full(us.shape, face), us, vs)
        lat = np.degrees(np.arctan2(z, np.hypot(x, y)))
        lng = np.degrees(np.arctan2(y, x))
        # Pole-containing cell: full longitude span, pole as the extreme.
        pole_leaf = s2.latlng_to_cell(np.array([90.0, -90.0]),
                                      np.array([0.0, 0.0]), s2.MAX_LEVEL)
        has_np = bool(s2.cell_contains(np.array([cell_id]), pole_leaf[:1])[0])
        has_sp = bool(s2.cell_contains(np.array([cell_id]), pole_leaf[1:])[0])
        # Pad by sampled spacing PLUS a curvature term: a latitude extremum
        # falls between samples exactly where first differences vanish, so
        # |dlat| alone under-pads near the extremum — the interpolation
        # error there is bounded by the second difference.
        def _pad(vals: np.ndarray) -> float:
            d1 = float(np.max(np.abs(np.diff(vals))))
            d2 = float(np.max(np.abs(np.diff(vals, n=2))))
            return d1 + 2.0 * d2 + 1e-9

        pad_lat = _pad(lat)
        north = 90.0 if has_np else min(90.0, float(np.max(lat)) + pad_lat)
        south = -90.0 if has_sp else max(-90.0, float(np.min(lat)) - pad_lat)
        if has_np or has_sp:
            return south, -180.0, north, 180.0
        if float(np.max(lng)) - float(np.min(lng)) > 180.0:
            raise NotImplementedError(
                f"S2 cell {cell_id:#x} crosses the antimeridian; Area is a "
                "single [-180, 180] box — split the query at lng=180 or "
                "use a child cell on each side"
            )
        pad_lng = _pad(lng)
        west = max(-180.0, float(np.min(lng)) - pad_lng)
        east = min(180.0, float(np.max(lng)) + pad_lng)
        return south, west, north, east

    @property
    def datatype(self) -> DataType:
        return DataType.Float64

    @property
    def cse_hash(self) -> int | None:
        return stable_hash("s2", self.cell_id, self._underlying_area,
                           self.projection)

    def read_window(self, xoff: int, yoff: int, xsize: int, ysize: int,
                    window: Window) -> Any:
        if xsize <= 0 or ysize <= 0:
            raise ValueError("Request dimensions must be positive and non-zero")
        projection = self.projection
        assert projection is not None
        px0 = window.xoff + xoff
        py0 = window.yoff + yoff
        lngs = self._underlying_area.left + (px0 + np.arange(xsize) + 0.5) * projection.xstep
        lats = self._underlying_area.top + (py0 + np.arange(ysize) + 0.5) * projection.ystep
        from ..spatial import s2  # pylint: disable=C0415

        glng, glat = np.meshgrid(lngs, lats)
        ids = s2.latlng_to_cell(glat.ravel(), glng.ravel(), self.level)
        return (np.asarray(ids).reshape(ysize, xsize) == self.cell_id).astype(np.float64)
