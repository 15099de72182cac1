"""Mosaic (GroupLayer) scaling diag: sum a 6-child overlapping mosaic and
compare against the single-table qty sum.  Usage: taskset -c 0-7 python
scripts/diag_mosaic.py 8"""

import json, os, sys, time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
REPEAT = int(sys.argv[2]) if len(sys.argv) > 2 else 48


def main():
    from pyspark.sql import SparkSession
    import yirgacheffe_spark as yg
    from yirgacheffe_spark import harness

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(2 * CPUS, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8388608")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
        .config("spark.driver.extraJavaOptions", "-Xms48g -XX:+AlwaysPreTouch")  # pinned heap: see bench.py
        .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    paths = harness.bench_mosaic_children("/root/testdata/sf0.1", repeat=REPEAT)
    rasters = harness.bench_rasters_multiband("/root/testdata/sf0.1", repeat=REPEAT)
    harness.prewarm_files(paths + [rasters["qty"].path])

    mosaic = yg.GroupLayer.layer_from_files(paths, "mosaic")
    # warmup
    t = mosaic.sum(spark=spark)
    want = rasters["qty"].sum(spark=spark)
    ph = {}
    t0 = time.time(); got = mosaic.sum(spark=spark); ph["mosaic_sum"] = round(time.time() - t0, 3)
    t0 = time.time(); rasters["qty"].sum(spark=spark); ph["qty_sum"] = round(time.time() - t0, 3)
    assert got == want, (got, want)
    print(json.dumps({"cpus": CPUS, "sum": got, "ph": ph}))


main()
