"""Headline benchmark: runs the engine's flagship queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "throughput_rows_per_s": ...}

The suite covers the engine's three pillars: the tiled layer algebra
(scan + re-tiling join + fused kernels + aggregation), the cell-indexed
spatial joins over the synthetic pages table, and the training-data text
operators.  Run scripts/scaling_bench.py for the N-vs-4N-cores scaling
measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_PAGES = int(os.environ.get("YG_BENCH_PAGES", "200000"))


def build_spark():
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("yirgacheffe-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("YG_SPARK_DRIVER_MEM", "24g"))
        .getOrCreate()
    )


def main() -> int:
    import numpy as np
    from pyspark.sql import functions as F

    import yirgacheffe_spark as yg
    from yirgacheffe_spark import harness
    from yirgacheffe_spark.spatial import joins, pages
    from yirgacheffe_spark.text import ann, dedup, quality

    spark = build_spark()
    spark.sparkContext.setLogLevel("ERROR")

    rasters = harness.lineitem_rasters(SF_DIR)
    pages_df = pages.enriched_pages(spark, N_PAGES, res=6).persist()
    pages_df.count()  # materialise outside the timed region

    work_units = {"rows": 0}

    def timed(fn):
        t0 = time.time()
        out = fn()
        return time.time() - t0, out

    queries = {}

    # 1. AoH flagship: isin x range mask x quantity, full tile pipeline.
    def q_aoh():
        expr = (
            rasters["hab"].isin([1.0, 5.0, 7.0, 11.0])
            * ((rasters["elev"] >= 100) & (rasters["elev"] <= 800))
            * rasters["qty"]
        )
        return expr.sum(spark=spark)

    # 2. conv2d with halo exchange across tiles.
    def q_conv():
        return rasters["qty"].conv2d(np.ones((3, 3), dtype=np.float32)).sum(spark=spark)

    # 3. mosaic + unique (shuffle-combined distinct values).
    def q_unique():
        return len((rasters["hab"] % 7).unique(spark=spark))

    # 4. save: full result-tile write path.
    def q_save():
        out = "/tmp/yg_bench_save"
        return (rasters["qty"] * 2 + rasters["elev"]).save(out, spark=spark)

    # 5. point-in-polygon join over the pages table (hotspot polygons).
    pip_polys = [
        {"poly_id": 1, "geom_wkt": "POLYGON ((-76 38.5, -72 38.5, -72 42.5, -76 42.5, -76 38.5))"},
        {"poly_id": 2, "geom_wkt": "POLYGON ((-2 49.5, 2 49.5, 2 53.5, -2 53.5, -2 49.5))"},
        {"poly_id": 3, "geom_wkt": "POLYGON ((135 33, 143 33, 143 38, 135 38, 135 33))"},
    ]

    def q_pip():
        return joins.point_in_polygon_join(spark, pages_df, pip_polys, res=6).count()

    # 6. kNN by ring expansion (dense + sparse query mix).
    def q_knn():
        qs = [
            {"query_id": 1, "lat": 40.7, "lng": -74.0},
            {"query_id": 2, "lat": 51.5, "lng": -0.1},
            {"query_id": 3, "lat": -33.0, "lng": 100.0},
        ]
        return joins.knn_join(spark, pages_df, qs, k=10, res=6).count()

    # 7. text quality + token stats over pages (JVM column algebra only).
    def q_text():
        return (
            pages_df.select(
                quality.token_count(F.col("text")).alias("t"),
                quality.quality_score(F.col("text")).alias("q"),
                quality.fingerprint(F.col("text")).alias("fp"),
            )
            .agg(F.sum("t"), F.avg("q"), F.count_distinct("fp"))
            .collect()[0][0]
        )

    # 8. minhash near-dup pairs over documents.
    def q_minhash():
        docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        return dedup.minhash_dedup_pairs(docs, num_perm=64, bands=16, threshold=0.8).count()

    # 9. brute-force ANN top-k for 8 queries over embeddings.
    def q_ann():
        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        qs = emb.orderBy("vec_id").limit(8).select(
            F.col("vec_id").alias("query_id"), "embedding"
        )
        return ann.brute_force_topk(emb, qs, k=10).count()

    # 10. relational baseline: pricing summary.
    def q_pricing():
        li = spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))
        return li.groupBy("l_returnflag", "l_linestatus").agg(
            F.count("*"), F.sum("l_quantity")
        ).count()

    suite = {
        "aoh_mask_sum": q_aoh,
        "conv2d_sum": q_conv,
        "unique_vals": q_unique,
        "save_tiles": q_save,
        "pages_pip_join": q_pip,
        "pages_knn": q_knn,
        "pages_text_quality": q_text,
        "doc_minhash_dedup": q_minhash,
        "ann_topk": q_ann,
        "pricing_summary": q_pricing,
    }

    total = 0.0
    for name, fn in suite.items():
        sec, _ = timed(fn)
        queries[name] = round(sec, 3)
        total += sec

    # Work accounting for the throughput headline: raster tiles + page rows +
    # join candidate rows processed.
    qty = rasters["qty"]
    n_tiles = (qty.window.ysize // 512 + 1) * (qty.window.xsize // 512 + 1) * 4  # 4 channels
    rows = N_PAGES + spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet")).count()
    throughput = (n_tiles + rows) / total if total else 0.0

    sf = SF_DIR.rstrip("/").split("sf")[-1]
    print(
        json.dumps(
            {
                "metric": "tiles+join-rows/sec (layer algebra + spatial joins + text ops suite)",
                "value": round(total, 3),
                "unit": "sec",
                "queries": queries,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
                "cpus": CPUS,
                "throughput_rows_per_s": round(throughput, 1),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
