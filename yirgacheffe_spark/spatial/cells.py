"""A deterministic hierarchical spatial cell index (H3/S2 analog).

Neither ``h3`` nor ``s2`` libraries exist in this environment, so the engine
ships its own index: at resolution ``r`` the globe is a regular grid of
``2^r x 2^(r+1)`` lat/lng cells (rows x cols), ids packed into an int64 as
``(r << 56) | (row << 28) | col``.  Unlike hexagons this tessellation is
exactly partitioning (every point belongs to exactly one cell per
resolution), child cells nest perfectly (each cell splits into 4 at r+1),
and every operation is a closed-form vectorised numpy expression — which is
what the engine needs cells for: join keys, partition pruning, ring-expansion
kNN, and adaptive skew splitting.

All functions accept numpy arrays and run batch-at-a-time (no per-row
Python), so they slot directly into pandas UDFs.
"""

from __future__ import annotations

import numpy as np

MAX_RES = 24


def _dims(res: int) -> tuple[int, int]:
    return (1 << res, 1 << (res + 1))  # rows, cols


def latlng_to_cell(lat, lng, res: int):
    """Vectorised point -> cell id.  lat in [-90, 90], lng wrapped to [-180, 180)."""
    if not 0 <= res <= MAX_RES:
        raise ValueError(f"resolution must be in [0, {MAX_RES}]")
    lat = np.asarray(lat, dtype=np.float64)
    lng = np.asarray(lng, dtype=np.float64)
    rows, cols = _dims(res)
    lng = ((lng + 180.0) % 360.0) - 180.0
    row = np.clip(np.floor((90.0 - lat) / (180.0 / rows)).astype(np.int64), 0, rows - 1)
    col = np.clip(np.floor((lng + 180.0) / (360.0 / cols)).astype(np.int64), 0, cols - 1)
    return (np.int64(res) << 56) | (row << 28) | col


def cell_resolution(cell):
    return (np.asarray(cell, dtype=np.int64) >> 56).astype(np.int64)


def cell_row_col(cell):
    cell = np.asarray(cell, dtype=np.int64)
    return ((cell >> 28) & ((1 << 28) - 1), cell & ((1 << 28) - 1))


def cell_bounds(cell):
    """(south, west, north, east) arrays for each cell id."""
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_resolution(cell)
    row, col = cell_row_col(cell)
    rows = (np.int64(1) << res).astype(np.float64)
    cols = (np.int64(1) << (res + 1)).astype(np.float64)
    h = 180.0 / rows
    w = 360.0 / cols
    north = 90.0 - row * h
    south = north - h
    west = -180.0 + col * w
    east = west + w
    return south, west, north, east


def cell_to_latlng(cell):
    """Cell center (lat, lng)."""
    south, west, north, east = cell_bounds(cell)
    return (south + north) / 2.0, (west + east) / 2.0


def cell_parent(cell, parent_res: int):
    cell = np.asarray(cell, dtype=np.int64)
    res = cell_resolution(cell)
    shift = res - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell resolution")
    row, col = cell_row_col(cell)
    return (np.int64(parent_res) << 56) | ((row >> shift) << 28) | (col >> shift)


def cell_children(cell: int) -> np.ndarray:
    """The four child cells one resolution down."""
    res = int(cell_resolution(cell))
    row, col = (int(v) for v in cell_row_col(cell))
    r2, c2 = row * 2, col * 2
    kids = []
    for dr in (0, 1):
        for dc in (0, 1):
            kids.append((np.int64(res + 1) << 56) | np.int64((r2 + dr) << 28) | np.int64(c2 + dc))
    return np.array(kids, dtype=np.int64)


def grid_disk(cell: int, k: int) -> np.ndarray:
    """All cells within Chebyshev distance k (the (2k+1)^2 block), wrapping in
    longitude and clipping at the poles — the ring-expansion primitive for kNN."""
    res = int(cell_resolution(cell))
    rows, cols = _dims(res)
    row, col = (int(v) for v in cell_row_col(cell))
    rr = np.arange(row - k, row + k + 1)
    cc = np.arange(col - k, col + k + 1)
    rr = rr[(rr >= 0) & (rr < rows)]
    cc = cc % cols
    grid_r, grid_c = np.meshgrid(rr, cc, indexing="ij")
    ids = (np.int64(res) << 56) | (grid_r.astype(np.int64) << 28) | grid_c.astype(np.int64)
    return np.unique(ids.ravel())


def grid_ring(cell: int, k: int) -> np.ndarray:
    """Only the cells at exactly Chebyshev distance k."""
    if k == 0:
        return np.array([cell], dtype=np.int64)
    disk = set(grid_disk(cell, k).tolist())
    inner = set(grid_disk(cell, k - 1).tolist())
    return np.array(sorted(disk - inner), dtype=np.int64)


def cell_boundary_wkt(cell: int) -> str:
    south, west, north, east = (float(v) for v in cell_bounds(cell))
    return (
        f"POLYGON (({west} {south}, {east} {south}, {east} {north}, "
        f"{west} {north}, {west} {south}))"
    )


def cells_covering_bbox(west: float, south: float, east: float, north: float, res: int) -> np.ndarray:
    """All cells at ``res`` intersecting the given lat/lng box (polygon
    candidate-pruning: a polygon's covering set is its envelope's)."""
    rows, cols = _dims(res)
    h, w = 180.0 / rows, 360.0 / cols
    r_lo = int(np.clip(np.floor((90.0 - north) / h), 0, rows - 1))
    r_hi = int(np.clip(np.floor((90.0 - south) / h - 1e-12), 0, rows - 1))
    c_lo = int(np.floor((west + 180.0) / w))
    c_hi = int(np.floor((east + 180.0) / w - 1e-12))
    rr = np.arange(r_lo, r_hi + 1, dtype=np.int64)
    cc = np.arange(c_lo, c_hi + 1, dtype=np.int64) % cols
    grid_r, grid_c = np.meshgrid(rr, np.unique(cc), indexing="ij")
    return ((np.int64(res) << 56) | (grid_r << 28) | grid_c).ravel()
