"""Diagnose aoh_mask_sum scaling: run in isolation at a given core count."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Per-stage worker timing (decode vs kernel) — must be set before the
# session starts so Python workers inherit it.
import glob
import tempfile

TIMING_PREFIX = os.path.join(tempfile.mkdtemp(prefix="yg_stage_"), "t")
os.environ["YG_STAGE_TIMING"] = TIMING_PREFIX

from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master(f"local[{CPUS}]")
    .appName("diag-aoh")
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

from yirgacheffe_spark import harness

rasters = harness.bench_rasters_multiband(SF_DIR, repeat=int(os.environ.get("YG_REPEAT", "192")))

def q_aoh():
    expr = (
        rasters["hab"].isin([1.0, 5.0, 7.0, 11.0])
        * ((rasters["elev"] >= 100) & (rasters["elev"] <= 800))
        * rasters["qty"]
    )
    return expr.sum(spark=spark)

def stage_totals():
    dec = ker = 0.0
    for f in glob.glob(TIMING_PREFIX + ".*"):
        with open(f) as fp:
            for line in fp:
                d, k = line.split()
                dec += float(d); ker += float(k)
        os.unlink(f)
    return dec, ker

for i in range(3):
    t0 = time.time()
    v = q_aoh()
    wall = time.time() - t0
    dec, ker = stage_totals()
    print(f"cpus={CPUS} run{i}: wall={wall:.2f}s decode_cpu={dec:.2f}s "
          f"kernel_cpu={ker:.2f}s value={v}")
