"""Analytic coordinate transforms for the CRS pairs the engine supports.

The reference relies on GDAL/pyproj for arbitrary CRS warps; this environment
has neither, so we implement the well-known public formulas for the pairs we
need (WGS84 lat/lng <-> Web/Spherical Mercator), which covers the web-pages
spatial pipeline and raster reprojection tests.  Unknown pairs raise
``NotImplementedError`` so callers fail loudly rather than silently misplace
tiles.
"""

from __future__ import annotations

import math
from typing import TYPE_CHECKING

import numpy as np

if TYPE_CHECKING:
    from .grid import CRS

# Spherical Mercator sphere radius (EPSG:3857 definition).
MERCATOR_RADIUS = 6378137.0
# WGS84 ellipsoid semi-major/semi-minor axes in metres (public constants).
WGS84_A_B = (6378137.0, 6356752.314245179)
MERCATOR_MAX_LAT = 85.05112877980659


def _is_mercator(crs: "CRS") -> bool:
    return crs.code in ("epsg:3857", "epsg:900913", "esri:102100")


def lnglat_to_mercator(lng, lat):
    """Vectorised forward Web-Mercator (arrays or scalars, degrees in)."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.clip(np.asarray(lat, dtype=np.float64), -MERCATOR_MAX_LAT, MERCATOR_MAX_LAT)
    x = np.radians(lng) * MERCATOR_RADIUS
    y = np.log(np.tan(np.pi / 4 + np.radians(lat) / 2)) * MERCATOR_RADIUS
    return x, y


def mercator_to_lnglat(x, y):
    x = np.asarray(x, dtype=np.float64)
    y = np.asarray(y, dtype=np.float64)
    lng = np.degrees(x / MERCATOR_RADIUS)
    lat = np.degrees(2 * np.arctan(np.exp(y / MERCATOR_RADIUS)) - np.pi / 2)
    return lng, lat


def transform_point(src: "CRS", dst: "CRS", x: float, y: float) -> tuple[float, float]:
    if src == dst:
        return (x, y)
    if src.is_geographic and _is_mercator(dst):
        mx, my = lnglat_to_mercator(x, y)
        return (float(mx), float(my))
    if _is_mercator(src) and dst.is_geographic:
        lng, lat = mercator_to_lnglat(x, y)
        return (float(lng), float(lat))
    raise NotImplementedError(f"No transform registered for {src.code} -> {dst.code}")


def transform_bounds(
    src: "CRS", dst: "CRS", minx: float, miny: float, maxx: float, maxy: float
) -> tuple[float, float, float, float]:
    """Transform a bounding box by densifying its edges (21 samples per edge),
    which bounds the curvature error the way GDAL's edge-sampling warp does."""
    if src == dst:
        return (minx, miny, maxx, maxy)
    ts = np.linspace(0.0, 1.0, 21)
    xs = minx + (maxx - minx) * ts
    ys = miny + (maxy - miny) * ts
    edge_x = np.concatenate([xs, xs, np.full_like(ys, minx), np.full_like(ys, maxx)])
    edge_y = np.concatenate([np.full_like(xs, miny), np.full_like(xs, maxy), ys, ys])
    if src.is_geographic and _is_mercator(dst):
        tx, ty = lnglat_to_mercator(edge_x, edge_y)
    elif _is_mercator(src) and dst.is_geographic:
        tx, ty = mercator_to_lnglat(edge_x, edge_y)
    else:
        raise NotImplementedError(f"No transform registered for {src.code} -> {dst.code}")
    return (float(tx.min()), float(ty.min()), float(tx.max()), float(ty.max()))


def area_of_pixel_m2(semi_major: float, semi_minor: float, x_scale_deg: float,
                     y_scale_deg: float, center_lat: float) -> float:
    """Exact ellipsoidal area in m^2 of one pixel centred at ``center_lat``.

    Standard geodetic zone-area formula (see the reference's
    ``_layers/area_per_pixel.py:14-28`` crediting gis.stackexchange 127165).
    """
    e = math.sqrt(1 - (semi_minor / semi_major) ** 2)
    band_areas = []
    for lat_edge in (center_lat + y_scale_deg / 2, center_lat - y_scale_deg / 2):
        s = math.sin(math.radians(lat_edge))
        zm, zp = 1 - e * s, 1 + e * s
        band_areas.append(
            math.pi * semi_minor**2 * ((math.log(zp / zm) / (2 * e)) + (s / (zp * zm)))
        )
    return abs((x_scale_deg / 360.0) * (band_areas[0] - band_areas[1]))
