"""Capture .explain('formatted') for bench queries into plans/r06/.

Usage:
    SPARK_GRAFT_SF_DIR=... python scripts/capture_plans.py <suffix> [q1,q2,...]

Writes plans/r06/<query>_<suffix>.txt.  For terminal-action queries the
captured DataFrame is the one the action consumes (noted in the file).
"""
from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf1.0")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
OUT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "plans", "r06")


def main():
    import numpy as np
    from pyspark.sql import SparkSession, functions as F

    import yirgacheffe_spark as yg
    from yirgacheffe_spark import harness
    from yirgacheffe_spark.plans import executor
    from yirgacheffe_spark.spatial import joins
    from yirgacheffe_spark.text import ann, dedup, quality

    suffix = sys.argv[1]
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .appName("capture-plans")
        .config("spark.sql.shuffle.partitions", str(max(2 * CPUS, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8388608")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "24g")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(OUT_DIR, exist_ok=True)

    rasters = harness.bench_rasters_multiband(SF_DIR, repeat=48)
    pages_path = harness.bench_pages(spark, SF_DIR, 400000, res=6)
    pages_df = spark.read.parquet(pages_path)
    minhash_path = harness.bench_pages(spark, SF_DIR, 50000, res=6, seed=11)
    minhash_corpus = spark.read.parquet(minhash_path).selectExpr(
        "url AS doc_id", "text")

    def knn_df():
        qs = spark.range(2048).selectExpr(
            "id AS query_id",
            "CAST((id * 37) % 160 - 80 + 0.7 AS DOUBLE) AS lat",
            "CAST((id * 91) % 360 - 180 + 0.3 AS DOUBLE) AS lng",
        )
        return joins.knn_join_df(spark, pages_df, qs, k=10, res=6)

    def conv_df():
        return executor.tiles_dataframe(
            rasters["qty"].conv2d(np.ones((5, 5), dtype=np.float32)), spark)

    def aoh_df():
        expr = (
            rasters["hab"].isin([1.0, 5.0, 7.0, 11.0])
            * ((rasters["elev"] >= 100) & (rasters["elev"] <= 800))
            * rasters["qty"]
        )
        return executor.tiles_dataframe(expr, spark)

    def save_df():
        return executor.tiles_dataframe(
            rasters["qty"] * 2 + rasters["elev"], spark)

    def mosaic_df():
        paths = harness.bench_mosaic_children(SF_DIR, repeat=48)
        return executor.tiles_dataframe(
            yg.GroupLayer.layer_from_files(paths, "mosaic"), spark)

    def unique_df():
        # the grouped distinct frame unique() counts then collects
        return executor.tiles_dataframe(rasters["hab"] % 7, spark)

    def text_df():
        return pages_df.select(
            quality.token_count(F.col("text")).alias("t"),
            quality.quality_score(F.col("text")).alias("q"),
            quality.fingerprint(F.col("text")).alias("fp"),
        ).agg(F.sum("t"), F.avg("q"), F.count_distinct("fp"))

    def minhash_df():
        sigs = dedup.minhash_signatures(
            minhash_corpus, "text", "doc_id", num_perm=64, shingle_n=3,
            bands=16)
        return dedup.minhash_lsh_candidates(sigs, "doc_id", bands=16)

    def ann_df():
        emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
        qs = emb.orderBy("vec_id").limit(64).select(
            F.col("vec_id").alias("query_id"), "embedding")
        return ann.brute_force_topk_fast(emb, qs, k=10)

    builders = {
        "pages_knn": knn_df,
        "conv2d_sum": conv_df,
        "aoh_mask_sum": aoh_df,
        "save_tiles": save_df,
        "mosaic_sum": mosaic_df,
        "unique_vals": unique_df,
        "pages_text_quality": text_df,
        "minhash_lsh": minhash_df,
        "ann_topk": ann_df,
    }
    for name, fn in builders.items():
        if only is not None and name not in only:
            continue
        df = fn()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(os.path.join(OUT_DIR, f"{name}_{suffix}.txt"), "w",
                  encoding="utf-8") as fp:
            fp.write(f"# {name} [{suffix}] — .explain('formatted') of the "
                     "DataFrame the terminal action consumes\n")
            fp.write(buf.getvalue())
        print("captured", name, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
