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


# -- Transverse Mercator (UTM zones) ----------------------------------------
#
# Krueger series, 4th order in the third flattening n — the standard public
# formulas (Karney 2011, "Transverse Mercator with an accuracy of a few
# nanometers"; the coefficients below are the widely published 4th-order
# truncation, sub-mm over a UTM zone).  Covers epsg:32601-32660 (north) and
# epsg:32701-32760 (south).

_UTM_K0 = 0.9996
_UTM_E0 = 500_000.0
_UTM_N0_SOUTH = 10_000_000.0


def _utm_constants():
    a, b = WGS84_A_B
    f = (a - b) / a
    n = f / (2 - f)
    big_a = a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
    alpha = (
        n / 2 - 2 * n**2 / 3 + 5 * n**3 / 16 + 41 * n**4 / 180,
        13 * n**2 / 48 - 3 * n**3 / 5 + 557 * n**4 / 1440,
        61 * n**3 / 240 - 103 * n**4 / 140,
        49561 * n**4 / 161280,
    )
    beta = (
        n / 2 - 2 * n**2 / 3 + 37 * n**3 / 96 - n**4 / 360,
        n**2 / 48 + n**3 / 15 - 437 * n**4 / 1440,
        17 * n**3 / 480 - 37 * n**4 / 840,
        4397 * n**4 / 161280,
    )
    delta = (
        2 * n - 2 * n**2 / 3 - 2 * n**3 + 116 * n**4 / 45,
        7 * n**2 / 3 - 8 * n**3 / 5 - 227 * n**4 / 45,
        56 * n**3 / 15 - 136 * n**4 / 35,
        4279 * n**4 / 630,
    )
    c = 2 * math.sqrt(n) / (1 + n)
    return big_a, alpha, beta, delta, c


_UTM_A, _UTM_ALPHA, _UTM_BETA, _UTM_DELTA, _UTM_C = _utm_constants()


def utm_zone_lon0(zone: int) -> float:
    return float(zone * 6 - 183)


def _parse_utm(crs: "CRS") -> tuple[int, bool] | None:
    code = crs.code
    if not code.startswith("epsg:32"):
        return None
    try:
        num = int(code.split(":", 1)[1])
    except ValueError:
        return None
    if 32601 <= num <= 32660:
        return (num - 32600, False)
    if 32701 <= num <= 32760:
        return (num - 32700, True)
    return None


def utm_forward(lng, lat, zone: int, south: bool):
    """Vectorised WGS84 lat/lng (degrees) -> UTM easting/northing."""
    lng = np.asarray(lng, dtype=np.float64)
    lat = np.asarray(lat, dtype=np.float64)
    lam = np.radians((lng - utm_zone_lon0(zone) + 180.0) % 360.0 - 180.0)
    phi = np.radians(lat)
    s = np.sin(phi)
    t = np.sinh(np.arctanh(s) - _UTM_C * np.arctanh(_UTM_C * s))
    xi_p = np.arctan2(t, np.cos(lam))
    eta_p = np.arctanh(np.sin(lam) / np.sqrt(1 + t * t))
    xi, eta = xi_p.copy(), eta_p.copy()
    for j, aj in enumerate(_UTM_ALPHA, start=1):
        xi += aj * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
        eta += aj * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
    easting = _UTM_E0 + _UTM_K0 * _UTM_A * eta
    northing = (_UTM_N0_SOUTH if south else 0.0) + _UTM_K0 * _UTM_A * xi
    return easting, northing


def utm_inverse(easting, northing, zone: int, south: bool):
    """Vectorised UTM easting/northing -> WGS84 lng/lat (degrees)."""
    easting = np.asarray(easting, dtype=np.float64)
    northing = np.asarray(northing, dtype=np.float64)
    xi = (northing - (_UTM_N0_SOUTH if south else 0.0)) / (_UTM_K0 * _UTM_A)
    eta = (easting - _UTM_E0) / (_UTM_K0 * _UTM_A)
    xi_p, eta_p = xi.copy(), eta.copy()
    for j, bj in enumerate(_UTM_BETA, start=1):
        xi_p -= bj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
        eta_p -= bj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
    chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
    phi = chi.copy()
    for j, dj in enumerate(_UTM_DELTA, start=1):
        phi += dj * np.sin(2 * j * chi)
    lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
    return utm_zone_lon0(zone) + np.degrees(lam), np.degrees(phi)


def _to_geographic(crs: "CRS", x, y):
    if crs.is_geographic:
        return x, y
    if _is_mercator(crs):
        return mercator_to_lnglat(x, y)
    utm = _parse_utm(crs)
    if utm is not None:
        return utm_inverse(x, y, *utm)
    raise NotImplementedError(f"No transform registered for {crs.code}")


def _from_geographic(crs: "CRS", lng, lat):
    if crs.is_geographic:
        return lng, lat
    if _is_mercator(crs):
        return lnglat_to_mercator(lng, lat)
    utm = _parse_utm(crs)
    if utm is not None:
        return utm_forward(lng, lat, *utm)
    raise NotImplementedError(f"No transform registered for {crs.code}")


def transform_points(src: "CRS", dst: "CRS", xs, ys):
    """Vectorised full-2D transform (arrays in, arrays out) via the
    geographic hub."""
    if src == dst:
        return np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64)
    return _from_geographic(dst, *_to_geographic(src, xs, ys))


def separable_pair(src: "CRS", dst: "CRS") -> bool:
    """True when x depends only on x and y only on y across the pair —
    the precondition of the per-axis reprojection machinery.  Geographic
    and (Web-)Mercator are mutually separable; Transverse Mercator is not
    (easting depends on latitude through convergence)."""
    if src == dst:
        return True
    def axis_aligned(crs):
        return crs.is_geographic or _is_mercator(crs)
    return axis_aligned(src) and axis_aligned(dst)


def transform_point(src: "CRS", dst: "CRS", x: float, y: float) -> tuple[float, float]:
    if src == dst:
        return (x, y)
    out_x, out_y = transform_points(src, dst, np.array([x]), np.array([y]))
    return (float(out_x[0]), float(out_y[0]))


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
    tx, ty = transform_points(src, dst, edge_x, edge_y)
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
