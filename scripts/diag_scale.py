"""Measure per-phase scaling candidates at a given core count."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
PHASES = sys.argv[2].split(",") if len(sys.argv) > 2 else None
N = int(os.environ.get("N_PAGES", "3200000"))
M = int(os.environ.get("M_DOCS", "200000"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import SparkSession, functions as F

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("diag-scale")
    .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.files.maxPartitionBytes", "8388608")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8m")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .config("spark.driver.memory", "48g")
    .config("spark.driver.extraJavaOptions", "-Xms48g -XX:+AlwaysPreTouch")  # pinned heap: see bench.py
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

from yirgacheffe_spark.spatial import joins, pages
from yirgacheffe_spark.text import dedup, quality


def p_enrich():
    return pages.enriched_pages(spark, N, res=6, seed=7).where("extracted = text").count()


def p_quality():
    df = pages.enriched_pages(spark, N, res=6, seed=9)
    return (
        df.select(
            quality.token_count(F.col("text")).alias("t"),
            quality.quality_score(F.col("text")).alias("q"),
            quality.fingerprint(F.col("text")).alias("fp"),
        )
        .agg(F.sum("t"), F.avg("q"), F.count_distinct("fp"))
        .collect()[0][0]
    )


def p_minhash():
    corpus = pages.enriched_pages(spark, M, res=6, seed=11).selectExpr("url AS doc_id", "text")
    sigs = dedup.minhash_signatures(corpus, "text", "doc_id", num_perm=64, shingle_n=3)
    return dedup.minhash_lsh_candidates(sigs, "doc_id", bands=16).count()


def p_pip():
    polys = [
        {"poly_id": 1, "geom_wkt": "POLYGON ((-76 38.5, -72 38.5, -72 42.5, -76 42.5, -76 38.5))"},
        {"poly_id": 2, "geom_wkt": "POLYGON ((-2 49.5, 2 49.5, 2 53.5, -2 53.5, -2 49.5))"},
        {"poly_id": 3, "geom_wkt": "POLYGON ((135 33, 143 33, 143 38, 135 38, 135 33))"},
    ]
    df = pages.enriched_pages(spark, N, res=6, seed=13)
    return joins.point_in_polygon_join(spark, df, polys, res=6).count()


phases = {
    "enrich": p_enrich,
    "quality": p_quality,
    "minhash": p_minhash,
    "pip": p_pip,
}
for name, fn in phases.items():
    if PHASES and name not in PHASES:
        continue
    fn()  # warmup
    t0 = time.time()
    fn()
    print(f"cpus={CPUS} {name}: {time.time()-t0:.2f}s")
