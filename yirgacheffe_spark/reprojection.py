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


# -- Ellipsoids and datum shifts ---------------------------------------------
#
# All constants are the published EPSG/geodesy values; datum shifts are the
# standard 7-parameter position-vector Helmert transforms.  A single-Helmert
# OSGB36 shift is the published approximation (±~3 m vs the OSTN15 grid GDAL
# ships) — documented, deterministic, and exactly invertible here because the
# inverse solves the same linear map rather than negating the parameters.


class _Ellipsoid:
    def __init__(self, a: float, inv_f: float):
        self.a = a
        self.f = 1.0 / inv_f
        self.b = a * (1.0 - self.f)
        self.e2 = self.f * (2.0 - self.f)
        self.e = math.sqrt(self.e2)


_ELL_WGS84 = _Ellipsoid(6378137.0, 298.257223563)
_ELL_GRS80 = _Ellipsoid(6378137.0, 298.257222101)
_ELL_AIRY1830 = _Ellipsoid(6377563.396, 299.3249646)
# GRS80 authalic sphere (MODIS sinusoidal grid radius).
_ELL_AUTHALIC_SPHERE = _Ellipsoid(6371007.181, float("inf"))


class _Helmert:
    """Position-vector 7-parameter transform FROM WGS84 TO the local datum
    (tx/ty/tz metres, rx/ry/rz arc-seconds, scale ppm).  ``inverse`` solves
    the exact linear map, so round trips are exact."""

    def __init__(self, tx, ty, tz, rx_as, ry_as, rz_as, s_ppm):
        arc = math.pi / (180.0 * 3600.0)
        rx, ry, rz = rx_as * arc, ry_as * arc, rz_as * arc
        self.t = np.array([tx, ty, tz], dtype=np.float64)
        self.m = (1.0 + s_ppm * 1e-6) * np.array(
            [[1.0, -rz, ry], [rz, 1.0, -rx], [-ry, rx, 1.0]], dtype=np.float64
        )
        self.m_inv = np.linalg.inv(self.m)

    def apply(self, xyz: np.ndarray) -> np.ndarray:
        return self.m @ xyz + self.t[:, None]

    def inverse(self, xyz: np.ndarray) -> np.ndarray:
        return self.m_inv @ (xyz - self.t[:, None])


# WGS84 -> OSGB36 (the published single-Helmert approximation).
_HELMERT_OSGB36 = _Helmert(-446.448, 125.157, -542.060,
                           -0.1502, -0.2470, -0.8421, 20.4894)


def _geodetic_to_geocentric(ell: _Ellipsoid, lng, lat):
    phi, lam = np.radians(lat), np.radians(lng)
    s, c = np.sin(phi), np.cos(phi)
    nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
    return np.stack([nu * c * np.cos(lam), nu * c * np.sin(lam),
                     nu * (1.0 - ell.e2) * s])


def _geocentric_to_geodetic(ell: _Ellipsoid, xyz: np.ndarray):
    x, y, z = xyz
    lam = np.arctan2(y, x)
    p = np.hypot(x, y)
    phi = np.arctan2(z, p * (1.0 - ell.e2))  # first guess
    for _ in range(10):  # linear convergence (factor ~ e2): 10 -> sub-nm
        s = np.sin(phi)
        nu = ell.a / np.sqrt(1.0 - ell.e2 * s * s)
        phi = np.arctan2(z + ell.e2 * nu * s, p)
    return np.degrees(lam), np.degrees(phi)


def _datum_wgs84_to_local(ell: _Ellipsoid, helmert: "_Helmert | None", lng, lat):
    if helmert is None:
        return lng, lat
    xyz = _geodetic_to_geocentric(_ELL_WGS84, lng, lat)
    return _geocentric_to_geodetic(ell, helmert.apply(xyz))


def _datum_local_to_wgs84(ell: _Ellipsoid, helmert: "_Helmert | None", lng, lat):
    if helmert is None:
        return lng, lat
    xyz = _geodetic_to_geocentric(ell, lng, lat)
    return _geocentric_to_geodetic(_ELL_WGS84, helmert.inverse(xyz))


# -- Transverse Mercator ------------------------------------------------------
#
# Krueger series, 4th order in the third flattening n — the standard public
# formulas (Karney 2011, "Transverse Mercator with an accuracy of a few
# nanometers"; the coefficients below are the widely published 4th-order
# truncation, sub-mm over a zone's width).  Parameterised by ellipsoid and
# false origin, so one implementation covers UTM (epsg:326xx/327xx), the
# ETRS89 zones (epsg:258xx), and national TM grids like OSGB (epsg:27700).

_UTM_K0 = 0.9996
_UTM_E0 = 500_000.0
_UTM_N0_SOUTH = 10_000_000.0

_TM_SERIES_CACHE: dict = {}


def _tm_series(ell: _Ellipsoid):
    key = (ell.a, ell.f)
    if key in _TM_SERIES_CACHE:
        return _TM_SERIES_CACHE[key]
    n = ell.f / (2 - ell.f)
    big_a = ell.a / (1 + n) * (1 + n**2 / 4 + n**4 / 64)
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
    out = (big_a, alpha, beta, delta, c)
    _TM_SERIES_CACHE[key] = out
    return out


class _TM:
    """Transverse Mercator on any ellipsoid with a false origin at
    (lat0, lon0) and optional datum shift from WGS84."""

    separable = False

    def __init__(self, ell: _Ellipsoid, lon0: float, lat0: float, k0: float,
                 e0: float, n0: float, helmert: "_Helmert | None" = None):
        self.ell, self.lon0, self.k0 = ell, lon0, k0
        self.e0, self.helmert = e0, helmert
        big_a, alpha, _, _, c = _tm_series(ell)
        # Northing of lat0 on the central meridian (lam = 0): subtracting it
        # anchors the grid's false origin.
        if lat0 != 0.0:
            # Meridian arc of lat0 via the same series at lam = 0 (eta = 0).
            s0 = math.sin(math.radians(lat0))
            t0 = math.sinh(math.atanh(s0) - c * math.atanh(c * s0))
            xi0 = math.atan2(t0, 1.0)
            xi = xi0
            for j, aj in enumerate(alpha, start=1):
                xi += aj * math.sin(2 * j * xi0)
            self.n0 = n0 - k0 * big_a * xi
        else:
            self.n0 = n0

    def forward(self, lng, lat):
        lng = np.asarray(lng, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        lng, lat = _datum_wgs84_to_local(self.ell, self.helmert, lng, lat)
        big_a, alpha, _, _, c = _tm_series(self.ell)
        lam = np.radians((lng - self.lon0 + 180.0) % 360.0 - 180.0)
        phi = np.radians(lat)
        s = np.sin(phi)
        t = np.sinh(np.arctanh(s) - c * np.arctanh(c * s))
        xi_p = np.arctan2(t, np.cos(lam))
        eta_p = np.arctanh(np.sin(lam) / np.sqrt(1 + t * t))
        xi, eta = xi_p.copy(), eta_p.copy()
        for j, aj in enumerate(alpha, start=1):
            xi += aj * np.sin(2 * j * xi_p) * np.cosh(2 * j * eta_p)
            eta += aj * np.cos(2 * j * xi_p) * np.sinh(2 * j * eta_p)
        return self.e0 + self.k0 * big_a * eta, self.n0 + self.k0 * big_a * xi

    def inverse(self, easting, northing):
        easting = np.asarray(easting, dtype=np.float64)
        northing = np.asarray(northing, dtype=np.float64)
        big_a, _, beta, delta, _ = _tm_series(self.ell)
        xi = (northing - self.n0) / (self.k0 * big_a)
        eta = (easting - self.e0) / (self.k0 * big_a)
        xi_p, eta_p = xi.copy(), eta.copy()
        for j, bj in enumerate(beta, start=1):
            xi_p -= bj * np.sin(2 * j * xi) * np.cosh(2 * j * eta)
            eta_p -= bj * np.cos(2 * j * xi) * np.sinh(2 * j * eta)
        chi = np.arcsin(np.sin(xi_p) / np.cosh(eta_p))
        phi = chi.copy()
        for j, dj in enumerate(delta, start=1):
            phi += dj * np.sin(2 * j * chi)
        lam = np.arctan2(np.sinh(eta_p), np.cos(xi_p))
        lng, lat = self.lon0 + np.degrees(lam), np.degrees(phi)
        return _datum_local_to_wgs84(self.ell, self.helmert, lng, lat)


# -- Polar stereographic (Snyder 1987, ellipsoidal, variant B) ---------------


class _PolarStereo:
    separable = False

    def __init__(self, ell: _Ellipsoid, lat_ts: float, lon0: float,
                 south: bool, e0: float = 0.0, n0: float = 0.0):
        self.ell, self.lon0, self.south = ell, lon0, south
        self.e0, self.n0 = e0, n0
        e = ell.e
        phi_f = math.radians(abs(lat_ts))
        sf = math.sin(phi_f)
        self._m_f = math.cos(phi_f) / math.sqrt(1 - ell.e2 * sf * sf)
        self._t_f = math.tan(math.pi / 4 - phi_f / 2) / (
            (1 - e * sf) / (1 + e * sf)
        ) ** (e / 2)

    def _t_of(self, phi):
        e = self.ell.e
        s = np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)

    def forward(self, lng, lat):
        lng = np.asarray(lng, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        if self.south:
            lng, lat = -lng, -lat
            lon0 = -self.lon0
        else:
            lon0 = self.lon0
        phi = np.radians(lat)
        rho = self.ell.a * self._m_f * self._t_of(phi) / self._t_f
        dlam = np.radians((lng - lon0 + 180.0) % 360.0 - 180.0)
        x = rho * np.sin(dlam)
        y = -rho * np.cos(dlam)
        if self.south:
            x, y = -x, -y
        return self.e0 + x, self.n0 + y

    def inverse(self, easting, northing):
        x = np.asarray(easting, dtype=np.float64) - self.e0
        y = np.asarray(northing, dtype=np.float64) - self.n0
        if self.south:
            x, y = -x, -y
        rho = np.hypot(x, y)
        t = rho * self._t_f / (self.ell.a * self._m_f)
        chi = np.pi / 2 - 2 * np.arctan(t)
        e2 = self.ell.e2
        # Standard chi -> phi series (Snyder 3-5).
        phi = (
            chi
            + (e2 / 2 + 5 * e2**2 / 24 + e2**3 / 12 + 13 * e2**4 / 360) * np.sin(2 * chi)
            + (7 * e2**2 / 48 + 29 * e2**3 / 240 + 811 * e2**4 / 11520) * np.sin(4 * chi)
            + (7 * e2**3 / 120 + 81 * e2**4 / 1120) * np.sin(6 * chi)
            + (4279 * e2**4 / 161280) * np.sin(8 * chi)
        )
        dlam = np.arctan2(x, -y)
        lng = self.lon0 + np.degrees(dlam)
        lat = np.degrees(phi)
        if self.south:
            lng, lat = self.lon0 - np.degrees(dlam), -lat
        return (lng + 180.0) % 360.0 - 180.0, lat


# -- Lambert Conformal Conic, 2 standard parallels (Snyder 1987) -------------


class _LCC2SP:
    separable = False

    def __init__(self, ell: _Ellipsoid, lat0: float, lon0: float,
                 sp1: float, sp2: float, e0: float, n0: float,
                 helmert: "_Helmert | None" = None):
        self.ell, self.lon0 = ell, lon0
        self.e0, self.n0, self.helmert = e0, n0, helmert
        e, e2 = ell.e, ell.e2

        def m_of(phi):
            s = math.sin(phi)
            return math.cos(phi) / math.sqrt(1 - e2 * s * s)

        def t_of(phi):
            s = math.sin(phi)
            return math.tan(math.pi / 4 - phi / 2) / (
                (1 - e * s) / (1 + e * s)
            ) ** (e / 2)

        p1, p2, p0 = (math.radians(v) for v in (sp1, sp2, lat0))
        self.n = (math.log(m_of(p1)) - math.log(m_of(p2))) / (
            math.log(t_of(p1)) - math.log(t_of(p2))
        )
        self.f_cone = m_of(p1) / (self.n * t_of(p1) ** self.n)
        self.rho0 = ell.a * self.f_cone * t_of(p0) ** self.n

    def _t_of(self, phi):
        e = self.ell.e
        s = np.sin(phi)
        return np.tan(np.pi / 4 - phi / 2) / ((1 - e * s) / (1 + e * s)) ** (e / 2)

    def forward(self, lng, lat):
        lng = np.asarray(lng, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        lng, lat = _datum_wgs84_to_local(self.ell, self.helmert, lng, lat)
        phi = np.radians(lat)
        rho = self.ell.a * self.f_cone * self._t_of(phi) ** self.n
        theta = self.n * np.radians((lng - self.lon0 + 180.0) % 360.0 - 180.0)
        x = self.e0 + rho * np.sin(theta)
        y = self.n0 + self.rho0 - rho * np.cos(theta)
        return x, y

    def inverse(self, easting, northing):
        x = np.asarray(easting, dtype=np.float64) - self.e0
        yy = self.rho0 - (np.asarray(northing, dtype=np.float64) - self.n0)
        rho = np.sign(self.n) * np.hypot(x, yy)
        theta = np.arctan2(np.sign(self.n) * x, np.sign(self.n) * yy)
        t = (rho / (self.ell.a * self.f_cone)) ** (1.0 / self.n)
        chi = np.pi / 2 - 2 * np.arctan(t)
        e2 = self.ell.e2
        phi = (
            chi
            + (e2 / 2 + 5 * e2**2 / 24 + e2**3 / 12 + 13 * e2**4 / 360) * np.sin(2 * chi)
            + (7 * e2**2 / 48 + 29 * e2**3 / 240 + 811 * e2**4 / 11520) * np.sin(4 * chi)
            + (7 * e2**3 / 120 + 81 * e2**4 / 1120) * np.sin(6 * chi)
            + (4279 * e2**4 / 161280) * np.sin(8 * chi)
        )
        lng = self.lon0 + np.degrees(theta / self.n)
        lat = np.degrees(phi)
        return _datum_local_to_wgs84(self.ell, self.helmert, lng, lat)


# -- Albers Equal-Area Conic, 2 standard parallels (Snyder 1987 §14) ----------


class _Albers:
    """Ellipsoidal Albers equal-area conic — the standard continental
    analysis grid family (epsg:5070 NAD83/Conus Albers and siblings).
    Forward: Snyder 14-1..14-4 via the authalic q function; inverse:
    authalic latitude series (Snyder 3-18)."""

    separable = False

    def __init__(self, ell: _Ellipsoid, lat0: float, lon0: float,
                 sp1: float, sp2: float, e0: float, n0: float,
                 helmert: "_Helmert | None" = None):
        self.ell, self.lon0 = ell, lon0
        self.e0, self.n0, self.helmert = e0, n0, helmert
        e, e2 = ell.e, ell.e2

        def m_of(phi):
            s = math.sin(phi)
            return math.cos(phi) / math.sqrt(1 - e2 * s * s)

        def q_of(phi):
            s = math.sin(phi)
            return (1 - e2) * (
                s / (1 - e2 * s * s)
                - (1.0 / (2 * e)) * math.log((1 - e * s) / (1 + e * s))
            )

        p1, p2, p0 = (math.radians(v) for v in (sp1, sp2, lat0))
        m1, m2 = m_of(p1), m_of(p2)
        q1, q2, q0 = q_of(p1), q_of(p2), q_of(p0)
        self.n = (m1 * m1 - m2 * m2) / (q2 - q1)
        self.C = m1 * m1 + self.n * q1
        self.rho0 = ell.a * math.sqrt(self.C - self.n * q0) / self.n
        self._q_pole = q_of(math.pi / 2)

    def _q_of(self, phi):
        e, e2 = self.ell.e, self.ell.e2
        s = np.sin(phi)
        return (1 - e2) * (
            s / (1 - e2 * s * s) - (1.0 / (2 * e)) * np.log((1 - e * s) / (1 + e * s))
        )

    def forward(self, lng, lat):
        lng = np.asarray(lng, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        lng, lat = _datum_wgs84_to_local(self.ell, self.helmert, lng, lat)
        q = self._q_of(np.radians(lat))
        rho = self.ell.a * np.sqrt(self.C - self.n * q) / self.n
        theta = self.n * np.radians((lng - self.lon0 + 180.0) % 360.0 - 180.0)
        x = self.e0 + rho * np.sin(theta)
        y = self.n0 + self.rho0 - rho * np.cos(theta)
        return x, y

    def inverse(self, easting, northing):
        x = np.asarray(easting, dtype=np.float64) - self.e0
        yy = self.rho0 - (np.asarray(northing, dtype=np.float64) - self.n0)
        rho = np.sign(self.n) * np.hypot(x, yy)
        theta = np.arctan2(np.sign(self.n) * x, np.sign(self.n) * yy)
        q = (self.C - (rho * self.n / self.ell.a) ** 2) / self.n
        beta = np.arcsin(np.clip(q / self._q_pole, -1.0, 1.0))
        e2 = self.ell.e2
        # Authalic -> geodetic latitude (Snyder 3-18).
        phi = (
            beta
            + (e2 / 3 + 31 * e2**2 / 180 + 517 * e2**3 / 5040) * np.sin(2 * beta)
            + (23 * e2**2 / 360 + 251 * e2**3 / 3780) * np.sin(4 * beta)
            + (761 * e2**3 / 45360) * np.sin(6 * beta)
        )
        lng = self.lon0 + np.degrees(theta / self.n)
        lat = np.degrees(phi)
        return _datum_local_to_wgs84(self.ell, self.helmert, lng, lat)


# -- Ellipsoidal Mercator (epsg:3395 World Mercator) -------------------------


class _EllipsoidalMercator:
    separable = True  # x depends only on lng, y only on lat

    def __init__(self, ell: _Ellipsoid):
        self.ell = ell

    def forward(self, lng, lat):
        lng = np.asarray(lng, dtype=np.float64)
        lat = np.clip(np.asarray(lat, dtype=np.float64), -89.9, 89.9)
        e = self.ell.e
        phi = np.radians(lat)
        s = np.sin(phi)
        x = self.ell.a * np.radians(lng)
        y = self.ell.a * (
            np.arctanh(s) - e * np.arctanh(e * s)
        )
        return x, y

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        lng = np.degrees(x / self.ell.a)
        e = self.ell.e
        psi = y / self.ell.a
        # Invert the isometric latitude by Newton iteration (quadratic
        # convergence; 6 iterations reach double-precision roundoff).
        phi = 2 * np.arctan(np.exp(psi)) - np.pi / 2
        for _ in range(6):
            s = np.sin(phi)
            f = np.arctanh(s) - e * np.arctanh(e * s) - psi
            df = (1.0 / (1.0 - s * s) - e * e / (1.0 - e * e * s * s)) * np.cos(phi)
            phi = phi - f / df
        return lng, np.degrees(phi)


# -- Sinusoidal (Snyder 1987 section 30, ellipsoidal; equal-area) --------------


class _Sinusoidal:
    """Ellipsoidal sinusoidal (Snyder 30-8/30-9) — the MODIS / ESRI:54008
    family.  Equal-area, pseudocylindrical; on a sphere (inv_f = inf) it
    reduces to x = R*lam*cos(phi), y = R*phi — the MODIS land grid, whose
    published half-width pi*R = 20015109.354 m pins the constant."""

    separable = False  # x depends on both lng and lat

    def __init__(self, ell: _Ellipsoid, lon0: float = 0.0,
                 e0: float = 0.0, n0: float = 0.0,
                 helmert: "_Helmert | None" = None):
        self.ell, self.lon0, self.e0, self.n0 = ell, lon0, e0, n0
        self.helmert = helmert
        e2 = ell.e2
        # Meridian-arc series (Snyder 3-21) and its inverse (3-26).
        self._m = (
            1 - e2 / 4 - 3 * e2 ** 2 / 64 - 5 * e2 ** 3 / 256,
            3 * e2 / 8 + 3 * e2 ** 2 / 32 + 45 * e2 ** 3 / 1024,
            15 * e2 ** 2 / 256 + 45 * e2 ** 3 / 1024,
            35 * e2 ** 3 / 3072,
        )
        se = math.sqrt(1.0 - e2)
        e1 = (1.0 - se) / (1.0 + se)
        self._inv = (
            3 * e1 / 2 - 27 * e1 ** 3 / 32,
            21 * e1 ** 2 / 16 - 55 * e1 ** 4 / 32,
            151 * e1 ** 3 / 96,
            1097 * e1 ** 4 / 512,
        )

    def forward(self, lng, lat):
        lng = np.asarray(lng, dtype=np.float64)
        lat = np.asarray(lat, dtype=np.float64)
        lng, lat = _datum_wgs84_to_local(self.ell, self.helmert, lng, lat)
        lam = np.radians((lng - self.lon0 + 180.0) % 360.0 - 180.0)
        phi = np.radians(lat)
        s = np.sin(phi)
        x = self.ell.a * lam * np.cos(phi) / np.sqrt(1.0 - self.ell.e2 * s * s)
        m0, m2, m4, m6 = self._m
        merid = self.ell.a * (m0 * phi - m2 * np.sin(2 * phi)
                              + m4 * np.sin(4 * phi) - m6 * np.sin(6 * phi))
        return self.e0 + x, self.n0 + merid

    def inverse(self, x, y):
        x = np.asarray(x, dtype=np.float64) - self.e0
        y = np.asarray(y, dtype=np.float64) - self.n0
        mu = y / (self.ell.a * self._m[0])
        i2, i4, i6, i8 = self._inv
        phi = (mu + i2 * np.sin(2 * mu) + i4 * np.sin(4 * mu)
               + i6 * np.sin(6 * mu) + i8 * np.sin(8 * mu))
        s = np.sin(phi)
        cos_phi = np.cos(phi)
        with np.errstate(divide="ignore", invalid="ignore"):
            lam = x * np.sqrt(1.0 - self.ell.e2 * s * s) / (self.ell.a * cos_phi)
        lam = np.where(np.abs(cos_phi) < 1e-12, 0.0, lam)
        lng, lat = self.lon0 + np.degrees(lam), np.degrees(phi)
        return _datum_local_to_wgs84(self.ell, self.helmert, lng, lat)


def utm_zone_lon0(zone: int) -> float:
    return float(zone * 6 - 183)


def _parse_utm(crs: "CRS") -> tuple[int, bool] | None:
    code = crs.code
    # ETRS89 (epsg:258xx) zones are routed in _projection_for, not here —
    # their numbers never fall in the 326xx/327xx ranges below.
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


# The projected-CRS registry.  Entries are constructed lazily (cached) so an
# import never pays for projections it does not use.
_PROJ_CACHE: dict = {}


def _projection_for(crs: "CRS"):
    code = crs.code
    if code in _PROJ_CACHE:
        return _PROJ_CACHE[code]
    proj = None
    utm = _parse_utm(crs)
    if utm is not None:
        zone, south = utm
        proj = _TM(_ELL_WGS84, utm_zone_lon0(zone), 0.0, _UTM_K0, _UTM_E0,
                   _UTM_N0_SOUTH if south else 0.0)
    elif code.startswith("epsg:258"):
        try:
            num = int(code.split(":", 1)[1])
        except ValueError:
            num = -1
        if 25828 <= num <= 25838:  # ETRS89 / UTM zones (GRS80; datum ~ WGS84)
            proj = _TM(_ELL_GRS80, utm_zone_lon0(num - 25800), 0.0, _UTM_K0,
                       _UTM_E0, 0.0)
    elif code == "epsg:27700":  # British National Grid (Airy 1830 + OSGB36)
        proj = _TM(_ELL_AIRY1830, -2.0, 49.0, 0.9996012717, 400_000.0,
                   -100_000.0, helmert=_HELMERT_OSGB36)
    elif code == "epsg:2154":  # RGF93 / Lambert-93 (GRS80; datum ~ WGS84)
        proj = _LCC2SP(_ELL_GRS80, 46.5, 3.0, 49.0, 44.0, 700_000.0, 6_600_000.0)
    elif code == "epsg:3413":  # NSIDC Sea Ice Polar Stereographic North
        proj = _PolarStereo(_ELL_WGS84, 70.0, -45.0, south=False)
    elif code == "epsg:3031":  # Antarctic Polar Stereographic
        proj = _PolarStereo(_ELL_WGS84, -71.0, 0.0, south=True)
    elif code == "epsg:3395":  # WGS84 World (ellipsoidal) Mercator
        proj = _EllipsoidalMercator(_ELL_WGS84)
    elif code == "epsg:5070":  # NAD83 / Conus Albers (GRS80; datum ~ WGS84)
        proj = _Albers(_ELL_GRS80, 23.0, -96.0, 29.5, 45.5, 0.0, 0.0)
    elif code == "epsg:3577":  # GDA94 / Australian Albers (GRS80)
        proj = _Albers(_ELL_GRS80, 0.0, 132.0, -18.0, -36.0, 0.0, 0.0)
    elif code == "esri:54008":  # World Sinusoidal (WGS84 ellipsoid)
        proj = _Sinusoidal(_ELL_WGS84)
    elif code == "esri:53008":  # Sphere Sinusoidal — ESRI's GCS_Sphere is
        # the 6371000 m sphere, NOT the MODIS radius (that grid is below).
        proj = _Sinusoidal(_Ellipsoid(6371000.0, float("inf")))
    elif code == "crs:modis_sinusoidal":  # The MODIS land grid: sinusoidal
        # on the GRS80 authalic sphere, half-width pi*R = 20015109.355 m
        # (docs round to 20015109.354); no EPSG code exists for it.
        proj = _Sinusoidal(_ELL_AUTHALIC_SPHERE)
    if proj is not None:
        _PROJ_CACHE[code] = proj
    return proj


# -- User-parameterized CRS registration ---------------------------------------

# Published reference ellipsoids (semi-major axis, inverse flattening) —
# the set national grids are defined on.  Custom ellipsoids pass (a, 1/f).
_NAMED_ELLIPSOIDS = {
    "wgs84": _ELL_WGS84,
    # GRS80 authalic sphere — the MODIS sinusoidal grid radius.
    "authalic_sphere": _ELL_AUTHALIC_SPHERE,
    "grs80": _ELL_GRS80,
    "airy1830": _ELL_AIRY1830,
    "intl1924": _Ellipsoid(6378388.0, 297.0),
    "clarke1866": _Ellipsoid(6378206.4, 294.978698214),
    "bessel1841": _Ellipsoid(6377397.155, 299.1528128),
    "krassowsky1940": _Ellipsoid(6378245.0, 298.3),
}


def register_crs(code: str, projection: str,
                 ellipsoid="wgs84", *,
                 lon0: float = 0.0, lat0: float = 0.0, k0: float = 1.0,
                 lat_ts: "float | None" = None,
                 sp1: "float | None" = None, sp2: "float | None" = None,
                 south: bool = False,
                 false_easting: float = 0.0, false_northing: float = 0.0,
                 helmert: "tuple | None" = None) -> None:
    """Register a projected CRS from its defining parameters, so any
    TM/LCC/stereographic/Mercator national grid works without a code
    change (the per-EPSG entries above are just pre-registered instances
    of the same machinery).  The reference accepts any GDAL-known CRS
    (``_datatypes/area.py:315-364``); this is the no-GDAL equivalent —
    the user supplies the published parameters once and every transform,
    extent-prediction and reprojection path picks them up.

    ``projection`` is one of:

    * ``"transverse_mercator"`` — uses lon0, lat0, k0, false_easting,
      false_northing (e.g. any national TM grid);
    * ``"lambert_conformal_conic_2sp"`` — lat0, lon0, sp1, sp2,
      false_easting, false_northing;
    * ``"albers_equal_area"`` — same parameter set as LCC-2SP (the
      equal-area conic: epsg:5070 Conus Albers, epsg:3577 Australian
      Albers and every other continental analysis grid);
    * ``"polar_stereographic"`` — lat_ts (standard parallel), lon0,
      south, false_easting, false_northing;
    * ``"mercator"`` — ellipsoidal Mercator (no false origin).

    ``ellipsoid`` is a name from ``_NAMED_ELLIPSOIDS`` or an
    ``(a, inv_flattening)`` tuple.  ``helmert`` is the optional published
    7-parameter position-vector shift FROM WGS84 TO the grid's datum
    (tx, ty, tz metres, rx, ry, rz arc-seconds, scale ppm) — omit when
    the datum is WGS84-equivalent (GRS80/ETRS89/NAD83 at raster scales).

    Re-registering a code replaces it (useful for tests); built-in codes
    can be shadowed the same way.
    """
    if isinstance(ellipsoid, str):
        try:
            ell = _NAMED_ELLIPSOIDS[ellipsoid.lower()]
        except KeyError:
            raise ValueError(
                f"unknown ellipsoid {ellipsoid!r}; named options: "
                f"{sorted(_NAMED_ELLIPSOIDS)} or pass (a, inv_flattening)"
            ) from None
    else:
        a, inv_f = ellipsoid
        ell = _Ellipsoid(float(a), float(inv_f))
    shift = _Helmert(*helmert) if helmert is not None else None

    kind = projection.lower()
    if kind == "transverse_mercator":
        proj = _TM(ell, lon0, lat0, k0, false_easting, false_northing,
                   helmert=shift)
    elif kind == "lambert_conformal_conic_2sp":
        if sp1 is None or sp2 is None:
            raise ValueError("lambert_conformal_conic_2sp needs sp1 and sp2")
        proj = _LCC2SP(ell, lat0, lon0, sp1, sp2, false_easting,
                       false_northing, helmert=shift)
    elif kind == "albers_equal_area":
        if sp1 is None or sp2 is None:
            raise ValueError("albers_equal_area needs sp1 and sp2")
        proj = _Albers(ell, lat0, lon0, sp1, sp2, false_easting,
                       false_northing, helmert=shift)
    elif kind == "polar_stereographic":
        if lat_ts is None:
            raise ValueError("polar_stereographic needs lat_ts")
        if shift is not None:
            raise ValueError("polar_stereographic does not take a helmert "
                             "shift (polar grids are WGS84-based)")
        proj = _PolarStereo(ell, lat_ts, lon0, south=south,
                            e0=false_easting, n0=false_northing)
    elif kind == "mercator":
        if shift is not None or false_easting or false_northing:
            raise ValueError("mercator takes no helmert/false origin here")
        proj = _EllipsoidalMercator(ell)
    elif kind == "sinusoidal":
        proj = _Sinusoidal(ell, lon0, false_easting, false_northing,
                           helmert=shift)
    else:
        raise ValueError(
            f"unknown projection kind {projection!r}; supported: "
            "transverse_mercator, lambert_conformal_conic_2sp, "
            "albers_equal_area, polar_stereographic, mercator, sinusoidal"
        )

    from .grid import CRS as _CRS  # pylint: disable=C0415

    _PROJ_CACHE[_CRS(code).code] = proj


def utm_forward(lng, lat, zone: int, south: bool):
    """Vectorised WGS84 lat/lng (degrees) -> UTM easting/northing."""
    proj = _TM(_ELL_WGS84, utm_zone_lon0(zone), 0.0, _UTM_K0, _UTM_E0,
               _UTM_N0_SOUTH if south else 0.0)
    return proj.forward(lng, lat)


def utm_inverse(easting, northing, zone: int, south: bool):
    """Vectorised UTM easting/northing -> WGS84 lng/lat (degrees)."""
    proj = _TM(_ELL_WGS84, utm_zone_lon0(zone), 0.0, _UTM_K0, _UTM_E0,
               _UTM_N0_SOUTH if south else 0.0)
    return proj.inverse(easting, northing)


def _to_geographic(crs: "CRS", x, y):
    if crs.is_geographic:
        return x, y
    if _is_mercator(crs):
        return mercator_to_lnglat(x, y)
    proj = _projection_for(crs)
    if proj is not None:
        return proj.inverse(x, y)
    raise NotImplementedError(f"No transform registered for {crs.code}")


def _from_geographic(crs: "CRS", lng, lat):
    if crs.is_geographic:
        return lng, lat
    if _is_mercator(crs):
        return lnglat_to_mercator(lng, lat)
    proj = _projection_for(crs)
    if proj is not None:
        return proj.forward(lng, lat)
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
    and Mercator variants (spherical 3857 and ellipsoidal 3395) are
    mutually separable; Transverse Mercator / polar stereographic / LCC
    are not (easting depends on latitude through convergence)."""
    if src == dst:
        return True

    def axis_aligned(crs):
        if crs.is_geographic or _is_mercator(crs):
            return True
        proj = _projection_for(crs)
        return proj is not None and proj.separable
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
