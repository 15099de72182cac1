"""Distributed spatial joins over cell-indexed tables.

The extension of the layer algebra's implicit align-join to point/polygon
space (north rule): every join is *candidate generation by cell equality*
(a pruned, shuffle-friendly equi-join Catalyst can optimise) followed by an
*exact vectorised predicate* inside a pandas UDF.

Skew strategy: the polygon/query side is broadcast when small; the page side
never materialises per-row Python.  Hot cells (megacities) are handled by
``adaptive_cells`` — re-keying rows of over-full cells to child cells until
each key is below a row budget — and by ``salted`` repartition keys for
aggregate-free joins.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.functions import pandas_udf

from . import cells as cellindex
from ..sources.vector import parse_wkt_polygon

EARTH_RADIUS_M = 6371008.8


def haversine_m(lat1, lng1, lat2, lng2):
    """Vectorised great-circle distance in metres."""
    p1, p2 = np.radians(lat1), np.radians(lat2)
    dp = p2 - p1
    dl = np.radians(lng2) - np.radians(lng1)
    a = np.sin(dp / 2) ** 2 + np.cos(p1) * np.cos(p2) * np.sin(dl / 2) ** 2
    return 2 * EARTH_RADIUS_M * np.arcsin(np.sqrt(a))


def points_in_rings(lat: np.ndarray, lng: np.ndarray, rings) -> np.ndarray:
    """Vectorised even-odd point-in-polygon over a batch of points."""
    inside = np.zeros(len(lat), dtype=bool)
    for ring in rings:
        x0, y0 = ring[:-1, 0], ring[:-1, 1]
        x1, y1 = ring[1:, 0], ring[1:, 1]
        for ex0, ey0, ex1, ey1 in zip(x0, y0, x1, y1):
            if ey0 == ey1:
                continue
            ylo, yhi = (ey0, ey1) if ey0 < ey1 else (ey1, ey0)
            hits = (lat >= ylo) & (lat < yhi)
            if not hits.any():
                continue
            x_at = ex0 + (lat[hits] - ey0) * (ex1 - ex0) / (ey1 - ey0)
            flip = np.zeros(len(lat), dtype=bool)
            flip[hits] = lng[hits] < x_at
            inside ^= flip
    return inside


def polygon_cover(polygons: list[dict], res: int) -> pd.DataFrame:
    """(poly_id, cell) covering rows: each polygon's envelope cells at ``res``
    — the candidate-pruning table (driver-side; polygons are the small dim)."""
    rows_poly, rows_cell = [], []
    for f in polygons:
        rings = parse_wkt_polygon(f["geom_wkt"])
        pts = np.vstack(rings)
        cover = cellindex.cells_covering_bbox(
            pts[:, 0].min(), pts[:, 1].min(), pts[:, 0].max(), pts[:, 1].max(), res
        )
        rows_poly.extend([f["poly_id"]] * len(cover))
        rows_cell.extend(cover.tolist())
    return pd.DataFrame({"poly_id": rows_poly, "cell": rows_cell})


def point_in_polygon_join(
    spark: SparkSession,
    pages: DataFrame,
    polygons: list[dict],
    res: int = 7,
    broadcast: bool = True,
) -> DataFrame:
    """Exact (page, polygon) containment pairs.

    Plan: pages ⋈ (poly_id, cell) on ``cell`` — broadcast hash join, zero
    shuffle of the page side — then a vectorised ray-cast verifies each
    candidate.  Output rows are exact (no envelope false-positives).

    ``pages`` must carry ``lat``, ``lng`` and ``cell`` (see
    ``pages.enriched_pages``); ``res`` must match the cell column.
    """
    cover = spark.createDataFrame(polygon_cover(polygons, res))
    if broadcast:
        cover = F.broadcast(cover)
    candidates = pages.join(cover, "cell", "inner")

    rings_by_id = {
        f["poly_id"]: parse_wkt_polygon(f["geom_wkt"]) for f in polygons
    }
    rings_bc = spark.sparkContext.broadcast(rings_by_id)

    @pandas_udf("boolean")
    def contains(lat: pd.Series, lng: pd.Series, poly_id: pd.Series) -> pd.Series:
        lat_v, lng_v = lat.to_numpy(), lng.to_numpy()
        out = np.zeros(len(lat_v), dtype=bool)
        for pid in np.unique(poly_id.to_numpy()):
            sel = poly_id.to_numpy() == pid
            # lng is x, lat is y in ring coordinates.
            rings = rings_bc.value[pid]
            out[sel] = points_in_rings(lat_v[sel], lng_v[sel], rings)
        return pd.Series(out)

    return candidates.where(contains(F.col("lat"), F.col("lng"), F.col("poly_id")))


def knn_join(
    spark: SparkSession,
    pages: DataFrame,
    queries: list[dict],
    k: int = 5,
    res: int = 7,
    max_ring: int = 6,
    id_col: str = "url",
) -> DataFrame:
    """For each query point, its k nearest pages by great-circle distance.

    Cell-ring expansion: candidates are pages whose cell lies within an
    expanding Chebyshev ring of the query's cell.  Rings grow geometrically
    (1, 2, 4, ...) and a query is *settled* once its k-th best distance is
    provably inside the searched ring (the ring's inscribed distance exceeds
    it) — the standard grid-kNN termination guarantee, run as a handful of
    pruned broadcast joins rather than one giant cross product.

    ``queries``: dicts with ``query_id``, ``lat``, ``lng``.
    """
    rows_s, rows_w, rows_n, rows_e = cellindex.cell_bounds(
        np.array([cellindex.latlng_to_cell(q["lat"], q["lng"], res) for q in queries],
                 dtype=np.int64)
    )
    # Cell height in metres bounds the inscribed radius of a ring.
    cell_h_m = (rows_n - rows_s) * 111_194.9  # metres per degree latitude

    pending = {q["query_id"]: q for q in queries}
    best: dict = {q["query_id"]: [] for q in queries}
    ring = 1
    results = []
    while pending and ring <= max_ring:
        cand_rows = []
        for qid, q in pending.items():
            c0 = int(cellindex.latlng_to_cell(q["lat"], q["lng"], res))
            for c in cellindex.grid_disk(c0, ring):
                cand_rows.append((qid, int(c), q["lat"], q["lng"]))
        cand = spark.createDataFrame(
            pd.DataFrame(cand_rows, columns=["query_id", "cell", "qlat", "qlng"])
        )
        joined = pages.join(F.broadcast(cand), "cell", "inner")

        @pandas_udf("double")
        def dist(lat: pd.Series, lng: pd.Series, qlat: pd.Series, qlng: pd.Series) -> pd.Series:
            return pd.Series(
                haversine_m(lat.to_numpy(), lng.to_numpy(), qlat.to_numpy(), qlng.to_numpy())
            )

        from pyspark.sql import Window as W

        scored = joined.withColumn("dist_m", dist("lat", "lng", "qlat", "qlng"))
        topk = (
            scored.withColumn(
                "rank",
                F.row_number().over(
                    W.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col(id_col).asc())
                ),
            )
            .where(F.col("rank") <= k)
            .select("query_id", F.col(id_col).alias("neighbor_id"), "dist_m", "rank")
        )
        batch = topk.collect()
        got: dict = {}
        for r in batch:
            got.setdefault(r["query_id"], []).append((r["dist_m"], r["neighbor_id"]))

        still = {}
        for i, (qid, q) in enumerate(list(pending.items())):
            hits = sorted(got.get(qid, []))
            # Safe radius: ring of Chebyshev distance r guarantees coverage of
            # a circle of (r-? ) cells; use (ring) * inscribed cell height.
            idx = [qq["query_id"] for qq in queries].index(qid)
            safe_m = ring * float(cell_h_m[idx])
            if len(hits) >= k and hits[k - 1][0] <= safe_m:
                results.extend(
                    (qid, url, d, rank + 1) for rank, (d, url) in enumerate(hits[:k])
                )
            elif ring >= max_ring:
                results.extend(
                    (qid, url, d, rank + 1) for rank, (d, url) in enumerate(hits[:k])
                )
            else:
                still[qid] = q
        pending = still
        ring *= 2

    return spark.createDataFrame(
        pd.DataFrame(results, columns=["query_id", id_col, "dist_m", "rank"])
    )


def adaptive_cells(pages: DataFrame, res: int, max_rows: int,
                   max_extra_levels: int = 3) -> DataFrame:
    """Re-key rows of over-full cells to child cells until every key holds at
    most ``max_rows`` rows (or the level budget runs out) — adaptive cell
    splitting for skewed joins/partitions.

    Adds ``part_cell``: the adaptive partition key.  Pure column arithmetic
    (cell ids are closed-form), driven by one aggregate per level.
    """
    out = pages.withColumn("part_cell", F.col("cell"))
    current_res = res
    for _ in range(max_extra_levels):
        counts = out.groupBy("part_cell").agg(F.count("*").alias("n"))
        hot = counts.where(F.col("n") > max_rows).select("part_cell")
        if hot.isEmpty():
            break
        current_res += 1
        hot = F.broadcast(hot.withColumnRenamed("part_cell", "hot_cell"))
        # Child id at res+1: (res+1)<<56 | (row*2 + lat_half)<<28 | (col*2 + lng_half)
        out = (
            out.join(hot, out["part_cell"] == hot["hot_cell"], "left")
            .withColumn(
                "part_cell",
                F.when(
                    F.col("hot_cell").isNull(), F.col("part_cell")
                ).otherwise(_child_cell_expr("part_cell", "lat", "lng", current_res)),
            )
            .drop("hot_cell")
        )
    return out


def cell_expr(lat_col: str, lng_col: str, res: int):
    """Closed-form Spark SQL expression for the engine's cell id containing a
    point (JVM-side column algebra; no UDF — mirrors cells.latlng_to_cell)."""
    rows = F.lit(float(1 << res))
    cols = F.lit(float(1 << (res + 1)))
    row = F.floor((F.lit(90.0) - F.col(lat_col)) / (F.lit(180.0) / rows)).cast("long")
    col = F.floor(
        ((F.col(lng_col) + F.lit(180.0)) % F.lit(360.0)) / (F.lit(360.0) / cols)
    ).cast("long")
    row = F.least(F.greatest(row, F.lit(0)), F.lit((1 << res) - 1))
    col = F.least(F.greatest(col, F.lit(0)), F.lit((1 << (res + 1)) - 1))
    return (F.lit(res).cast("long") * F.lit(1 << 56).cast("long")) + \
        F.shiftleft(row, 28) + col


def _child_cell_expr(cell_col: str, lat_col: str, lng_col: str, child_res: int):
    return cell_expr(lat_col, lng_col, child_res)


def salted(df: DataFrame, key_col: str, buckets: int = 16) -> DataFrame:
    """Append a deterministic salt column for repartitioning hot keys:
    ``repartition(col(key), col('salt'))`` spreads each key over ``buckets``
    reducers without changing join semantics (the other side explodes salt)."""
    return df.withColumn("salt", F.pmod(F.xxhash64(F.col(key_col), F.monotonically_increasing_id()), F.lit(buckets)))
