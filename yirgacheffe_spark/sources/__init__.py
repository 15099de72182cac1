from .base import Layer
from .memory import ArrayLayer, ConstantLayer, UniformAreaLayer, AreaPerPixelLayer
from .parquet import ParquetRasterLayer
from .group import GroupLayer, TiledGroupLayer
from .vector import VectorLayer
from .cells import CellLayer
from .reprojected import ReprojectedLayer

__all__ = [
    "Layer",
    "ArrayLayer",
    "ConstantLayer",
    "UniformAreaLayer",
    "AreaPerPixelLayer",
    "ParquetRasterLayer",
    "GroupLayer",
    "TiledGroupLayer",
    "VectorLayer",
    "CellLayer",
    "ReprojectedLayer",
]
