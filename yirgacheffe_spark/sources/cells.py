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
from .base import Layer


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
        return hash((self.cell_id, self._underlying_area, self.projection))

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
