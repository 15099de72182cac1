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


def point_in_polygon_join_df(
    spark: SparkSession,
    pages: DataFrame,
    polygons: DataFrame,
    res: int = 7,
    broadcast: bool = True,
) -> DataFrame:
    """Exact (page, polygon) containment pairs with a DataFrame polygon side.

    Plan: the cover table (poly_id, cell) is computed DISTRIBUTED from the
    polygon table (one Arrow batch pass: parse WKT, envelope cells); pages ⋈
    cover on ``cell`` prunes candidates (broadcast hash join when the
    polygon side is dim-sized — pass broadcast=False for huge polygon tables
    and let AQE pick the strategy); candidates then re-join the polygon
    geometry and a vectorised ray-cast verifies each one (per-batch parse
    cache: each polygon's WKT is parsed once per Arrow batch, points verify
    in bulk).  Output rows are exact (no envelope false-positives).

    ``pages`` must carry ``lat``, ``lng`` and ``cell``; ``res`` must match
    the cell column.  ``polygons`` must carry ``poly_id`` and ``geom_wkt``.
    """

    def cover_gen(batches):
        for pdf in batches:
            rows_poly, rows_cell = [], []
            for pid, wkt in zip(pdf["poly_id"], pdf["geom_wkt"]):
                pts = np.vstack(parse_wkt_polygon(wkt))
                cover_cells = cellindex.cells_covering_bbox(
                    pts[:, 0].min(), pts[:, 1].min(),
                    pts[:, 0].max(), pts[:, 1].max(), res,
                )
                rows_poly.extend([pid] * len(cover_cells))
                rows_cell.extend(cover_cells.tolist())
            yield pd.DataFrame({"poly_id": rows_poly, "cell": rows_cell})

    poly_id_type = dict(polygons.dtypes)["poly_id"]
    cover = polygons.select("poly_id", "geom_wkt").mapInPandas(
        cover_gen, schema=f"poly_id {poly_id_type}, cell long"
    )
    if broadcast:
        # Dim-sized polygon table: ship parsed rings ONCE per worker as a
        # broadcast variable instead of a geometry join (which attaches the
        # WKT string to every candidate row and re-parses per batch —
        # measured 2.2x slower on the bench polygons).
        rings_by_id = {
            r["poly_id"]: parse_wkt_polygon(r["geom_wkt"])
            for r in polygons.select("poly_id", "geom_wkt").collect()
        }
        rings_bc = spark.sparkContext.broadcast(rings_by_id)
        candidates = pages.join(F.broadcast(cover), "cell", "inner")

        @pandas_udf("boolean")
        def contains_bc(lat: pd.Series, lng: pd.Series,
                        poly_id: pd.Series) -> pd.Series:
            lat_v, lng_v = lat.to_numpy(), lng.to_numpy()
            pid_v = poly_id.to_numpy()
            out = np.zeros(len(lat_v), dtype=bool)
            for pid in pd.unique(pid_v):
                sel = pid_v == pid
                # lng is x, lat is y in ring coordinates.
                out[sel] = points_in_rings(
                    lat_v[sel], lng_v[sel], rings_bc.value[pid]
                )
            return pd.Series(out)

        return candidates.where(
            contains_bc(F.col("lat"), F.col("lng"), F.col("poly_id"))
        )

    # Huge polygon table: shuffle joins, geometry attached per candidate and
    # parsed once per (polygon, Arrow batch).
    candidates = pages.join(cover, "cell", "inner").join(
        polygons.select("poly_id", "geom_wkt"), "poly_id", "inner"
    )

    @pandas_udf("boolean")
    def contains(lat: pd.Series, lng: pd.Series, poly_id: pd.Series,
                 wkt: pd.Series) -> pd.Series:
        lat_v, lng_v = lat.to_numpy(), lng.to_numpy()
        pid_v = poly_id.to_numpy()
        out = np.zeros(len(lat_v), dtype=bool)
        for pid in pd.unique(pid_v):
            sel = pid_v == pid
            rings = parse_wkt_polygon(wkt[sel].iloc[0])
            # lng is x, lat is y in ring coordinates.
            out[sel] = points_in_rings(lat_v[sel], lng_v[sel], rings)
        return pd.Series(out)

    return candidates.where(
        contains(F.col("lat"), F.col("lng"), F.col("poly_id"), F.col("geom_wkt"))
    ).drop("geom_wkt")


def point_in_polygon_join(
    spark: SparkSession,
    pages: DataFrame,
    polygons: list[dict],
    res: int = 7,
    broadcast: bool = True,
) -> DataFrame:
    """List-of-dicts convenience wrapper over ``point_in_polygon_join_df``."""
    poly_df = spark.createDataFrame(
        pd.DataFrame(
            {"poly_id": [f["poly_id"] for f in polygons],
             "geom_wkt": [f["geom_wkt"] for f in polygons]}
        )
    )
    return point_in_polygon_join_df(spark, pages, poly_df, res=res, broadcast=broadcast)


def haversine_col(lat, lng, qlat, qlng):
    """Great-circle metres as a JVM column expression (term-for-term mirror
    of ``haversine_m``, so both engines and the SQL oracle agree)."""
    p1 = F.radians(qlat)
    p2 = F.radians(lat)
    a = (
        F.pow(F.sin((p2 - p1) / 2), 2)
        + F.cos(p1) * F.cos(p2) * F.pow(F.sin((F.radians(lng) - F.radians(qlng)) / 2), 2)
    )
    return F.lit(2.0) * F.lit(EARTH_RADIUS_M) * F.asin(F.sqrt(a))


def knn_join_df(
    spark: SparkSession,
    pages: DataFrame,
    queries: DataFrame,
    k: int = 5,
    res: int = 7,
    max_ring: int = 6,
    id_col: str = "url",
    broadcast_queries: bool = True,
    initial_ring: int | None = None,
) -> DataFrame:
    """Table-vs-table kNN: for every row of ``queries`` (query_id, lat, lng),
    its k nearest pages by great-circle distance.

    Fully distributed cell-ring expansion: each round scores only the NEW
    Chebyshev shell (prev_ring, ring] of cells around each still-unsettled
    query — shell cells are generated with JVM ``explode(sequence(...))``
    column algebra, candidates come from a cell-equality join, distances are
    JVM column math (no Python anywhere), and the per-query running top-k is
    a window re-rank over (previous best) ∪ (new shell hits).  A query
    settles once its k-th distance is provably inside the searched disk:
    ``ring * min(cell_height_m, chord-form cell_width_m at the disk's most
    poleward latitude)`` (width shrinks toward the poles; if the disk
    touches a pole the width bound collapses to zero and only ``max_ring``
    terminates).  The driver never sees a result row — it only checks
    per-round whether unsettled queries remain.

    Round count is the scale lever: every round costs one full
    candidate-scan of the page table PLUS an eager localCheckpoint barrier
    whose fixed cost grows with cores (measured: the old fixed ring-2 start
    took 2-3 serialized rounds on the bench mix and scaled 0.91x from 8 to
    32 cores).  ``initial_ring=None`` therefore estimates the page density
    with one (parquet-metadata-cheap) count and starts at the smallest ring
    whose disk is expected to hold >= 4k candidates, so the common case
    settles in ONE round; under-estimates only cost an extra (exact)
    escalation round, never correctness.
    """
    rows_n, cols_n = 1 << res, 1 << (res + 1)
    cell_h_deg = 180.0 / rows_n
    cell_w_deg = 360.0 / cols_n
    m_per_deg = 111_194.9

    if initial_ring is None:
        # Expected candidates in a (2r+1)^2 disk at mean density; aim for
        # 4k so the k-th distance sits well inside the settle radius.
        n_pages = pages.count()
        per_cell = max(n_pages / float(rows_n * cols_n), 1e-9)
        initial_ring = 2
        while (2 * initial_ring + 1) ** 2 * per_cell < 4 * k and initial_ring < max_ring:
            initial_ring *= 2
    initial_ring = max(1, min(initial_ring, max_ring))

    q = queries.select(
        "query_id",
        F.col("lat").cast("double").alias("qlat"),
        F.col("lng").cast("double").alias("qlng"),
    ).withColumn(
        "qrow",
        F.least(
            F.greatest(
                F.floor((F.lit(90.0) - F.col("qlat")) / F.lit(cell_h_deg)).cast("long"),
                F.lit(0),
            ),
            F.lit(rows_n - 1),
        ),
    ).withColumn(
        "qcol",
        F.least(
            F.greatest(
                F.floor(
                    (F.pmod(F.col("qlng") + F.lit(180.0), F.lit(360.0)))
                    / F.lit(cell_w_deg)
                ).cast("long"),
                F.lit(0),
            ),
            F.lit(cols_n - 1),
        ),
    )

    from pyspark.sql import Window as W

    pending = q
    best: DataFrame | None = None
    settled_frames: list[DataFrame] = []
    # Geometric ring schedule with factor 4 from the density-derived start:
    # every round costs one full candidate-scan of the page table regardless
    # of shell size, so fewer/wider rounds beat many narrow ones (measured:
    # x2 schedule spent 4 scans where x4 spends 2 on the bench query mix).
    prev_ring, ring = -1, min(initial_ring, max_ring)
    while True:
        shell = (
            pending.withColumn("dy", F.explode(F.sequence(F.lit(-ring), F.lit(ring))))
            .where(
                (F.col("qrow") + F.col("dy") >= 0)
                & (F.col("qrow") + F.col("dy") < rows_n)
            )
            .withColumn("dx", F.explode(F.sequence(F.lit(-ring), F.lit(ring))))
            .where(F.greatest(F.abs("dy"), F.abs("dx")) > prev_ring)
            .select(
                "query_id",
                "qlat",
                "qlng",
                (
                    F.lit(res).cast("long") * F.lit(1 << 56).cast("long")
                    + (F.col("qrow") + F.col("dy")) * F.lit(1 << 28).cast("long")
                    + F.pmod(F.col("qcol") + F.col("dx"), F.lit(cols_n))
                ).alias("cell"),
            )
        )
        if 2 * ring + 1 > cols_n:  # longitude wrap can duplicate shell cells
            shell = shell.dropDuplicates(["query_id", "cell"])
        cand = pages.join(
            F.broadcast(shell) if broadcast_queries else shell, "cell", "inner"
        )
        new_hits = cand.select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            haversine_col(F.col("lat"), F.col("lng"), F.col("qlat"), F.col("qlng")).alias("dist_m"),
        )
        merged = new_hits if best is None else best.unionByName(new_hits)
        if 2 * ring + 1 > cols_n:
            # Longitude wrap lets a physical cell re-enter a LATER shell
            # under a larger |dx| (17 right == 15 left on a 32-col grid), so
            # its pages would be scored twice; dedupe (rows are identical).
            merged = merged.dropDuplicates(["query_id", "neighbor_id"])
        # localCheckpoint (not persist): each round's running top-k feeds the
        # next round's plan on BOTH sides (shell candidates and the settle
        # check), so without lineage truncation the logical plan doubles per
        # round — exponential analyzer/broadcast cost by ring 4.  Truncation
        # caps it; the stored frame is <= k rows per unsettled query.
        best = (
            merged.withColumn(
                "rank",
                F.row_number().over(
                    W.partitionBy("query_id").orderBy(
                        F.col("dist_m").asc(), F.col("neighbor_id").asc()
                    )
                ),
            )
            .where(F.col("rank") <= k)
            .select("query_id", "neighbor_id", "dist_m")
            .localCheckpoint(eager=True)
        )

        stats = best.groupBy("query_id").agg(
            F.count("*").alias("_c"), F.max("dist_m").alias("_kth")
        )
        phi_far = F.least(
            F.lit(90.0), F.abs(F.col("qlat")) + F.lit((ring + 1) * cell_h_deg)
        )
        # Meridian gap is a great-circle arc, so the linear bound is exact.
        safe_lat_m = F.lit(ring * cell_h_deg * m_per_deg)
        # Longitude gap: the true minimum distance across a dLambda gap at
        # latitude phi is the chord form 2R*asin(cos(phi)*sin(dLambda/2)),
        # strictly BELOW the along-parallel arc R*dLambda*cos(phi) for
        # phi > 0 — the linear form overestimates the safe radius (~1% at
        # ring=8/res=5) and could settle a query before a nearer neighbor
        # just past the searched shell is seen.  Evaluate at the disk's most
        # poleward latitude; cap the gap at 180 deg (beyond that it wraps).
        half_gap_rad = math.radians(min(ring * cell_w_deg, 180.0)) / 2.0
        safe_lng_m = (
            F.lit(2.0 * EARTH_RADIUS_M)
            * F.asin(
                F.greatest(F.cos(F.radians(phi_far)), F.lit(0.0))
                * F.lit(math.sin(half_gap_rad))
            )
        )
        safe_m = F.least(safe_lat_m, safe_lng_m)
        judged = pending.join(stats, "query_id", "left")
        is_settled = (F.col("_c") >= k) & (F.col("_kth") <= safe_m)
        if ring >= max_ring:
            is_settled = F.lit(True)
        settled_ids = judged.where(is_settled).select("query_id")
        settled_frames.append(
            best.join(F.broadcast(settled_ids), "query_id", "left_semi")
        )
        if ring >= max_ring:
            # Everything force-settles — don't pay an eager checkpoint just
            # to materialise an empty pending frame.
            break
        pending = (
            judged.where(~F.coalesce(is_settled, F.lit(False)))
            .select("query_id", "qlat", "qlng", "qrow", "qcol")
            .localCheckpoint(eager=True)
        )
        if pending.isEmpty():
            break
        prev_ring, ring = ring, min(ring * 4, max_ring)

    out = settled_frames[0]
    for frame in settled_frames[1:]:
        out = out.unionByName(frame)
    out = (
        out.withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("query_id").orderBy(
                    F.col("dist_m").asc(), F.col("neighbor_id").asc()
                )
            ),
        )
        .where(F.col("rank") <= k)
        .select("query_id", F.col("neighbor_id").alias(id_col), "dist_m", "rank")
    )
    # settled_frames are localCheckpoint-backed (executor-resident, <= k rows
    # per query each); Spark's ContextCleaner reclaims them when the result
    # goes out of scope.  No driver collect anywhere.
    return out


def knn_join(
    spark: SparkSession,
    pages: DataFrame,
    queries: list[dict],
    k: int = 5,
    res: int = 7,
    max_ring: int = 6,
    id_col: str = "url",
) -> DataFrame:
    """List-of-dicts convenience wrapper over ``knn_join_df`` (``queries``:
    dicts with ``query_id``, ``lat``, ``lng``)."""
    qdf = spark.createDataFrame(
        pd.DataFrame(queries, columns=["query_id", "lat", "lng"])
    )
    return knn_join_df(
        spark, pages, qdf, k=k, res=res, max_ring=max_ring, id_col=id_col
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
    reducers without changing join semantics (the other side explodes salt).

    The salt is a CONTENT hash of the whole row — never a positional id like
    ``monotonically_increasing_id()``, which changes across task retries and
    would re-salt rows differently mid-job (a retried stage could then
    double-count or drop rows in salt-aware consumers).  Identical duplicate
    rows share a bucket; distinct rows of a hot key still spread."""
    return df.withColumn(
        "salt",
        F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(buckets)),
    )
