"""yirgacheffe_spark — a PySpark-native declarative geospatial layer algebra.

A from-scratch rebuild of the query semantics of quantifyearth/yirgacheffe
(lazy raster/vector layer expressions, union/intersection extent inference,
exact pixel-grid alignment) as a distributed tiling + spatial-join engine:
expressions compile to tile-partitioned DataFrame plans evaluated by fused
Arrow-vectorized numpy kernels, and the same cell-index machinery powers
point-in-polygon / kNN joins over web-scale page tables.

Public API mirrors the reference's ``yirgacheffe`` module surface
(``_core.py``): ``read_raster``/``read_rasters``/``read_shape``/``constant``/
``from_array``/``area_raster``/``h3_tile`` plus the operator functions.
"""

from __future__ import annotations

import os

import numpy as np

from .dtypes import DataType
from .grid import CRS, Area, MapProjection, Window
from .operators import LayerOperation, WindowOp, Op
from .operators.functions import (
    where,
    minimum,
    maximum,
    sum,  # pylint: disable=W0622
    any,  # pylint: disable=W0622
    all,  # pylint: disable=W0622
    clip,
    log,
    log2,
    log10,
    exp,
    exp2,
    nan_to_num,
    isin,
    abs,  # pylint: disable=W0622
    floor,
    round,  # pylint: disable=W0622
    ceil,
    logical_and,
    logical_or,
    logical_xor,
    logical_not,
)
from .sources import (
    ArrayLayer,
    ReprojectedLayer,
    AreaPerPixelLayer,
    CellLayer,
    ConstantLayer,
    GroupLayer,
    Layer,
    ParquetRasterLayer,
    TiledGroupLayer,
    UniformAreaLayer,
    VectorLayer,
)
from .sources.parquet import write_array_as_raster_table
from .sources.vector import load_geojson
from .plans.executor import save_multiband, zonal_stats, zonal_sum

# Familiar aliases for users coming from the reference API.

__version__ = "0.1.0"

# Reference-API class aliases (yirgacheffe names -> this engine's classes).
RasterLayer = ParquetRasterLayer
H3CellLayer = CellLayer


# -- reference-parity entry points (yirgacheffe/_core.py) --------------------

def read_raster(path: str, band: int = 1, ignore_nodata: bool = False):
    """Open a raster as a layer: a parquet tile table (this engine's native
    format), or a GeoTIFF file (the reference's native format, read with the
    pure-stdlib bridge — reference ``_layers/rasters.py:173-370``)."""
    if os.path.isfile(path):
        with open(path, "rb") as f:
            magic = f.read(4)
        if magic[:2] in (b"II", b"MM"):
            from .sources.geotiff import GeoTIFFLayer  # pylint: disable=C0415

            return GeoTIFFLayer(path, band=band, ignore_nodata=ignore_nodata)
    return ParquetRasterLayer(path, band=band, ignore_nodata=ignore_nodata)


def to_geotiff(tree, path: str, nodata: float | None = None, spark=None) -> None:
    """Materialise an expression/layer as a tiled deflate GeoTIFF file.

    A single .tif is one file — an inherent gather point — so the result is
    assembled on the driver (bounded by driver memory, like any tool that
    writes one GeoTIFF); use ``save()`` (parquet raster table) for outputs
    that must stay distributed."""
    from .operators import LayerOperation  # pylint: disable=C0415
    from .sources.geotiff import write_geotiff  # pylint: disable=C0415

    root = tree if isinstance(tree, LayerOperation) else LayerOperation(tree)
    w = root.window
    data = root.read_array(0, 0, w.xsize, w.ysize, spark=spark)
    write_geotiff(path, data, root.area, nodata=nodata)


def read_rasters(paths, name: str | None = None) -> GroupLayer:
    """Mosaic several rasters; the first listed wins on overlap."""
    return GroupLayer.layer_from_files(paths, name)


def read_shape(features, projection: MapProjection, burn_value=1, where_filter=None,
               datatype: DataType | None = None, name: str | None = None) -> VectorLayer:
    """Open a polygon table as a lazily-rasterized layer."""
    return VectorLayer(
        features, projection, burn_value=burn_value, where_filter=where_filter,
        datatype=datatype, name=name,
    )


def constant(value: float) -> ConstantLayer:
    return ConstantLayer(value)


def from_array(data: np.ndarray, origin: tuple[float, float],
               projection: MapProjection, name: str | None = None) -> ArrayLayer:
    return ArrayLayer.from_array(data, origin, projection, name)


def area_raster(projection: MapProjection) -> AreaPerPixelLayer:
    """Layer whose pixels are their own area in m²."""
    return AreaPerPixelLayer(projection)


def read_narrow_raster(column, area: Area, name: str | None = None) -> UniformAreaLayer:
    return UniformAreaLayer(column, area, name)


def h3_tile(cell_id: int, projection: MapProjection) -> CellLayer:
    """Rasterize one spatial-index cell to a 1.0/0.0 mask layer."""
    return CellLayer(cell_id, projection)


__all__ = [
    "DataType", "CRS", "Area", "MapProjection", "Window",
    "LayerOperation", "WindowOp", "Op",
    "where", "minimum", "maximum", "sum", "any", "all", "clip",
    "log", "log2", "log10", "exp", "exp2", "nan_to_num", "isin",
    "abs", "floor", "round", "ceil",
    "logical_and", "logical_or", "logical_xor", "logical_not",
    "Layer", "ArrayLayer", "ConstantLayer", "UniformAreaLayer",
    "AreaPerPixelLayer", "ParquetRasterLayer", "GroupLayer",
    "TiledGroupLayer", "VectorLayer", "CellLayer", "ReprojectedLayer",
    "read_raster", "read_rasters", "read_shape", "constant", "from_array",
    "area_raster", "read_narrow_raster", "h3_tile", "to_geotiff",
    "write_array_as_raster_table", "save_multiband", "zonal_sum",
    "zonal_stats",
    "load_geojson",
]
