"""Profile pages_knn stage-by-stage (guide §1): ring distribution, candidate
volume per ring, main-scan time vs fallback time, pending count.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python scripts/prof_knn.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main():
    import numpy as np
    from pyspark.sql import SparkSession, functions as F

    from yirgacheffe_spark import harness
    from yirgacheffe_spark.spatial import joins

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("prof-knn")
        .config("spark.sql.shuffle.partitions", str(max(2 * CPUS, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8388608")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions", "-Xms48g -XX:+AlwaysPreTouch")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    pages_path = harness.bench_pages(spark, SF_DIR, 400000, res=6)
    pages_df = spark.read.parquet(pages_path)
    pages_df.count()

    qs = spark.range(2048).selectExpr(
        "id AS query_id",
        "CAST((id * 37) % 160 - 80 + 0.7 AS DOUBLE) AS lat",
        "CAST((id * 91) % 360 - 180 + 0.3 AS DOUBLE) AS lng",
    )

    # Warm both the band-density cache and JVM codegen.
    t0 = time.time()
    joins.knn_join_df(spark, pages_df, qs, k=10, res=6).count()
    print(f"cold call: {time.time()-t0:.2f}s")
    for i in range(3):
        t0 = time.time()
        joins.knn_join_df(spark, pages_df, qs, k=10, res=6).count()
        print(f"warm call {i}: {time.time()-t0:.2f}s")

    # --- introspection: replicate the ring assignment ---------------------
    res, k, max_ring = 6, 10, 6
    import math
    rows_n, cols_n = 1 << res, 1 << (res + 1)
    counts = joins.band_density_profile(
        pages_df.select("cell", "lat", "lng", "url"), res)
    print("nonempty bands:", int((counts > 0).sum()), "of", len(counts))

    # Reuse the module's own ring logic by calling knn_join_df internals is
    # awkward; instead print per-band rings by running the same numpy code.
    cell_h_deg = 180.0 / rows_n
    cell_w_deg = 360.0 / cols_n
    m_per_deg = 111_194.9
    cell_h_m = cell_h_deg * m_per_deg
    n_bands = rows_n
    band_h_deg = 180.0 / n_bands
    lat_edges = 90.0 - np.arange(n_bands + 1) * band_h_deg
    band_area_m2 = (
        2.0 * math.pi * joins.EARTH_RADIUS_M ** 2
        * np.abs(np.sin(np.radians(lat_edges[:-1])) - np.sin(np.radians(lat_edges[1:])))
    )
    lat_center = 90.0 - (np.arange(n_bands) + 0.5) * band_h_deg
    ring_of_band = np.full(n_bands, max_ring, dtype=np.int64)
    undecided = np.ones(n_bands, dtype=bool)
    cum = np.concatenate([[0.0], np.cumsum(counts)])
    cum_area = np.concatenate([[0.0], np.cumsum(band_area_m2)])
    band_h_m = band_h_deg * 111_194.9
    nonempty = counts > 0
    idx = np.arange(n_bands)
    fwd = np.where(nonempty, idx, -10 ** 9)
    np.maximum.accumulate(fwd, out=fwd)
    bwd = np.where(nonempty, idx, 10 ** 9)
    bwd = np.minimum.accumulate(bwd[::-1])[::-1]
    gap_bands = np.minimum(np.abs(idx - fwd), np.abs(bwd - idx))
    kth_floor = np.maximum(gap_bands - 1, 0) * band_h_m
    ring_cap = max(max_ring, rows_n)
    r = 1
    while r < ring_cap:
        lo = np.maximum(np.arange(n_bands) - r, 0)
        hi = np.minimum(np.arange(n_bands) + r + 1, n_bands)
        frac = (2 * r + 1) / float(cols_n)
        exp_cand = (cum[hi] - cum[lo]) * frac
        disk_area = (cum_area[hi] - cum_area[lo]) * frac
        with np.errstate(divide="ignore", invalid="ignore"):
            est_kth = 2.0 * np.sqrt(
                max(k, 1) * disk_area / (math.pi * np.maximum(exp_cand, 1e-9)))
        ds = np.unique(np.concatenate(
            [[0, r], np.geomspace(1, max(r, 1), 24).astype(np.int64)]))
        phi_d = np.minimum(
            90.0, np.abs(lat_center)[:, None] + (ds[None, :] + 1) * cell_h_deg)
        chord_d = (
            2.0 * joins.EARTH_RADIUS_M
            * np.arcsin(np.maximum(np.cos(np.radians(phi_d)), 0.0)
                        * math.sin(math.radians(min(r * cell_w_deg, 180.0)) / 2.0)))
        safe = np.maximum(ds[None, :] * cell_h_m, chord_d).min(axis=1)
        est_kth = np.maximum(est_kth, kth_floor)
        ok = undecided & (exp_cand >= 4 * k) & (safe >= est_kth)
        ring_of_band[ok] = r
        undecided &= ~ok
        r *= 2

    import collections
    hist = collections.Counter(ring_of_band.tolist())
    print("ring histogram over bands:", dict(sorted(hist.items())))

    # Query ring distribution + candidate volume per ring.
    qrow = np.clip(((90.0 - np.array(
        [(i * 37) % 160 - 80 + 0.7 for i in range(2048)])) / cell_h_deg
    ).astype(np.int64), 0, rows_n - 1)
    qring = ring_of_band[qrow]
    qhist = collections.Counter(qring.tolist())
    print("ring histogram over 2048 queries:", dict(sorted(qhist.items())))
    # expected candidates by ring
    for rv in sorted(set(qring.tolist())):
        sel = qring == rv
        tot = 0.0
        for b in qrow[sel]:
            lo, hi = max(b - rv, 0), min(b + rv + 1, n_bands)
            tot += (cum[hi] - cum[lo]) * (2 * rv + 1) / cols_n
        print(f"ring {rv}: {int(sel.sum())} queries, "
              f"~{tot/1e6:.2f}M expected candidates")

    spark.stop()


if __name__ == "__main__":
    main()
