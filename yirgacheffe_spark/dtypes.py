"""Pixel data types.

Eleven numeric dtypes keyed by the public GDAL raster type codes (so metadata
written by this engine is interchangeable with GDAL-world tooling), with
conversions to/from numpy.  Result-type inference for expressions is numpy
coercion (``np.result_type``), matching the reference
(``_backends/enumeration.py:64-161``, ``_operators/__init__.py:757-775``).
"""

from __future__ import annotations

from enum import Enum

import numpy as np


class DataType(Enum):
    # Values are the standard GDAL GDT_* codes (public constants).
    Byte = 1
    UInt8 = 1  # alias of Byte, as in GDAL
    UInt16 = 2
    Int16 = 3
    UInt32 = 4
    Int32 = 5
    Float32 = 6
    Float64 = 7
    UInt64 = 12
    Int64 = 13
    Int8 = 14

    def to_gdal(self) -> int:
        return self.value

    @classmethod
    def of_gdal(cls, val: int) -> "DataType":
        return cls(val)

    @classmethod
    def of_numpy(cls, np_dtype) -> "DataType":
        return _NUMPY_TO_DTYPE[np.dtype(np_dtype)]

    @classmethod
    def of_array(cls, arr: np.ndarray) -> "DataType":
        return cls.of_numpy(arr.dtype)

    def to_numpy(self):
        return _DTYPE_TO_NUMPY[self]

    def sizeof(self) -> int:
        return np.dtype(self.to_numpy()).itemsize


_DTYPE_TO_NUMPY = {
    DataType.Byte: np.uint8,
    DataType.UInt16: np.uint16,
    DataType.Int16: np.int16,
    DataType.UInt32: np.uint32,
    DataType.Int32: np.int32,
    DataType.Float32: np.float32,
    DataType.Float64: np.float64,
    DataType.UInt64: np.uint64,
    DataType.Int64: np.int64,
    DataType.Int8: np.int8,
}

_NUMPY_TO_DTYPE = {np.dtype(v): k for k, v in _DTYPE_TO_NUMPY.items()}
# bools surface from comparison kernels; the reference's numpy backend keeps
# them as uint8-equivalent masks.
_NUMPY_TO_DTYPE[np.dtype(np.bool_)] = DataType.Byte


def result_datatype(*dtypes: DataType) -> DataType:
    """The dtype an operation yields, by numpy's coercion rules."""
    return DataType.of_numpy(np.result_type(*[d.to_numpy() for d in dtypes]))


def scalar_datatype(value) -> DataType:
    return DataType.of_numpy(np.result_type(value))
