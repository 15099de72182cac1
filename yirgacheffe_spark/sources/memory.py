"""In-memory and synthesized layers.

``ArrayLayer`` carries a numpy array (test fixtures, small rasters — shipped
to executors by closure/broadcast).  ``ConstantLayer``,
``UniformAreaLayer`` and ``AreaPerPixelLayer`` generate their pixels on the
fly inside the kernel: no data movement at any scale.

Semantics mirror the reference's ``_layers/{constant,area,area_per_pixel}.py``
and the ``from_array`` entry point (``_core.py:224-268``).
"""

from __future__ import annotations

import math
from typing import Any

import numpy as np

from ..dtypes import DataType
from ..grid import Area, MapProjection, Window
from ..reprojection import WGS84_A_B, area_of_pixel_m2
from .base import Layer, pad_to_window, stable_hash


class ArrayLayer(Layer):
    """A layer backed by an in-memory numpy array (row 0 = area top)."""

    def __init__(self, data: np.ndarray, area: Area, name: str | None = None,
                 nodata: float | None = None, ignore_nodata: bool = False):
        if area.projection is None:
            raise ValueError("ArrayLayer area must carry a projection")
        data = np.asarray(data)
        if data.ndim != 2:
            raise ValueError("ArrayLayer expects a 2-D array")
        super().__init__(area, name)
        expected = (self.window.ysize, self.window.xsize)
        if data.shape != expected:
            raise ValueError(f"Array shape {data.shape} does not match area pixels {expected}")
        self._data = data
        self._nodata = nodata
        self._ignore_nodata = ignore_nodata

    @classmethod
    def from_array(cls, data: np.ndarray, origin: tuple[float, float],
                   projection: MapProjection, name: str | None = None) -> "ArrayLayer":
        """Build a layer from an array plus the geo coords of its top-left corner."""
        data = np.asarray(data)
        height, width = data.shape
        left, top = origin
        area = Area(
            left=left,
            top=top,
            right=left + width * projection.xstep,
            bottom=top + height * projection.ystep,
            projection=projection,
        )
        return cls(data, area, name)

    @property
    def datatype(self) -> DataType:
        return DataType.of_array(self._data)

    @property
    def nodata(self):
        return self._nodata

    @property
    def cse_hash(self) -> int | None:
        return stable_hash(self.name, self._underlying_area, self.projection,
                           self.datatype, self._ignore_nodata)

    def read_window(self, xoff: int, yoff: int, xsize: int, ysize: int, window: Window) -> Any:
        if xsize <= 0 or ysize <= 0:
            raise ValueError("Request dimensions must be positive and non-zero")
        requested = Window(window.xoff + xoff, window.yoff + yoff, xsize, ysize)
        stored = Window(0, 0, self._data.shape[1], self._data.shape[0])
        overlap = Window.intersection_or_none([requested, stored])
        if overlap is None:
            return np.zeros((ysize, xsize), dtype=self._data.dtype)
        chunk = self._data[
            overlap.yoff : overlap.ymax,
            overlap.xoff : overlap.xmax,
        ]
        if overlap != requested:
            chunk = pad_to_window(chunk, overlap, requested)
        if not self._ignore_nodata and self._nodata is not None:
            chunk = np.where(chunk == self._nodata, float("nan"), chunk)
        return chunk


class ConstantLayer(Layer):
    """The same value everywhere; extent is the whole world."""

    def __init__(self, value: float):
        super().__init__(Area.world())
        self.value = float(value)

    @property
    def datatype(self) -> DataType:
        return DataType.Float64

    @property
    def cse_hash(self) -> int | None:
        return hash(self.value)

    def read_window(self, _x: int, _y: int, xsize: int, ysize: int, _window) -> Any:
        return np.full((ysize, xsize), self.value)

    def read_region(self, _area, _projection, x, y, width, height) -> Any:
        return np.full((height, width), self.value)

    def read_array(self, x: int, y: int, width: int, height: int) -> np.ndarray:
        return np.full((height, width), self.value)


class UniformAreaLayer(Layer):
    """A raster whose rows are constant: stored as one column, broadcast to
    full width at read time (the reference's 1-px-wide per-latitude area
    maps, ``_layers/area.py:14-102``).  Returns ``(h, 1)`` slices and lets
    numpy broadcasting widen them — no materialisation."""

    def __init__(self, column: np.ndarray, area: Area, name: str | None = None):
        if area.projection is None:
            raise ValueError("UniformAreaLayer area must carry a projection")
        column = np.asarray(column).reshape(-1, 1)
        projection = area.projection
        full_area = Area(
            math.floor(-180 / projection.xstep) * projection.xstep,
            area.top,
            math.ceil(180 / projection.xstep) * projection.xstep,
            area.bottom,
            projection=projection,
        )
        super().__init__(full_area, name)
        if column.shape[0] != self.window.ysize:
            raise ValueError(
                f"Column height {column.shape[0]} does not match area rows {self.window.ysize}"
            )
        self._column = column

    @property
    def datatype(self) -> DataType:
        return DataType.of_array(self._column)

    @property
    def cse_hash(self) -> int | None:
        return stable_hash(self.name, self._underlying_area, self.projection,
                           self.datatype)

    def read_window(self, _xoff: int, yoff: int, _xsize: int, ysize: int, window: Window) -> Any:
        if ysize <= 0:
            raise ValueError("Request dimensions must be positive and non-zero")
        start = window.yoff + yoff
        requested = Window(0, start, 1, ysize)
        stored = Window(0, 0, 1, self._column.shape[0])
        overlap = Window.intersection_or_none([requested, stored])
        if overlap is None:
            return np.zeros((ysize, 1), dtype=self._column.dtype)
        chunk = self._column[overlap.yoff : overlap.ymax]
        if overlap != requested:
            chunk = pad_to_window(chunk, overlap, requested)
        return chunk


class AreaPerPixelLayer(Layer):
    """Synthesized layer: each pixel's value is its area in m².

    Geographic CRS: exact ellipsoidal zone formula per latitude row
    (pure function of ``tile_y`` — no data read at any scale).  Projected
    CRS: constant ``|xstep * ystep|``.
    """

    def __init__(self, projection: MapProjection):
        if projection is None:
            raise ValueError("projection should not be None")
        if not isinstance(projection, MapProjection):
            raise TypeError("projection should be of type MapProjection")
        sx, sy = abs(projection.xstep), abs(projection.ystep)
        # Global bounds, snapped outward to the pixel grid.
        west, south, east, north = -180.0, -90.0, 180.0, 90.0
        area = Area(
            left=math.floor(west / sx) * sx,
            top=math.ceil(north / sy) * sy,
            right=math.ceil(east / sx) * sx,
            bottom=math.floor(south / sy) * sy,
            projection=projection,
        )
        super().__init__(area, "area_per_pixel")

    @property
    def datatype(self) -> DataType:
        return DataType.Float32

    @property
    def cse_hash(self) -> int | None:
        return stable_hash(self.name, self._underlying_area, self.projection)

    def operation_area(
        self, projection: MapProjection | None = None, _force_union: bool = False,
        top_level: bool = False,
    ) -> Area:
        """Extent-NEUTRAL, like ``ConstantLayer``: the layer synthesizes a
        pixel anywhere, so it must not drag an expression's extent out to the
        whole globe.  Returning the concrete global area instead would absorb
        the world sentinel of sibling scalar-comparison nodes in
        INTERSECTION/UNION reduction, making ``mask * area_raster()`` plan
        the full 18000x9000 grid (the driver gate silently computed ~10k
        empty tiles per query; at 4-px test tiles it OOMed the JVM)."""
        mine = self.projection
        if mine is not None and projection is not None and mine != projection:
            raise ValueError("Calculation projection does not match layer projection")
        return Area.world()

    def read_window(self, _xoff: int, yoff: int, xsize: int, ysize: int, window: Window) -> Any:
        projection = self.projection
        assert projection is not None
        if not projection.crs.is_geographic:
            return np.full((ysize, xsize), abs(projection.xstep * projection.ystep))
        a, b = WGS84_A_B
        offset = window.yoff + yoff
        ystep = projection.ystep
        rows = np.array(
            [
                area_of_pixel_m2(
                    a, b, projection.xstep, ystep,
                    self._underlying_area.top + ((offset + i + 0.5) * ystep),
                )
                for i in range(ysize)
            ]
        )
        return np.broadcast_to(rows[:, np.newaxis], (ysize, xsize))
