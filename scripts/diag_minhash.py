"""Profile minhash_lsh phases at a given core count (run under taskset).

Usage: taskset -c 0-7 python scripts/diag_minhash.py 8 [n_docs]
Prints one JSON line with per-phase seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CPUS = int(sys.argv[1]) if len(sys.argv) > 1 else 32
N_DOCS = int(sys.argv[2]) if len(sys.argv) > 2 else 800000
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    from pyspark.sql import SparkSession

    from yirgacheffe_spark import harness
    from yirgacheffe_spark.text import dedup

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{CPUS}]")
        .config("spark.sql.shuffle.partitions", str(max(2 * CPUS, 16)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", "8388608")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
    .config("spark.driver.extraJavaOptions", "-Xms48g -XX:+AlwaysPreTouch")  # pinned heap: see bench.py
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    path = harness.bench_pages(spark, SF_DIR, N_DOCS, res=6, seed=11)
    harness.prewarm_files([path])
    corpus = spark.read.parquet(path).selectExpr("url AS doc_id", "text")

    phases = {}

    # Untimed warmup (bench shape): absorb JVM codegen + Python worker pool
    # spin-up so the phase times measure steady-state throughput.
    warm = dedup.minhash_signatures(
        corpus, "text", "doc_id", num_perm=64, shingle_n=3, bands=16
    ).persist()
    dedup.minhash_lsh_candidates(warm, "doc_id", bands=16).count()
    warm.unpersist()

    t0 = time.time()
    sigs = dedup.minhash_signatures(
        corpus, "text", "doc_id", num_perm=64, shingle_n=3, bands=16
    ).persist()
    n_sigs = sigs.count()
    phases["signatures_persist"] = round(time.time() - t0, 3)

    t0 = time.time()
    from pyspark.sql import functions as F

    banded = sigs.select("doc_id", F.explode("buckets").alias("bucket"))
    hot = (
        banded.groupBy("bucket")
        .agg(F.count("*").alias("c"))
        .where((F.col("c") > 1) & (F.col("c") <= 4096))
        .select("bucket")
    )
    n_hot = hot.count()
    phases["bucket_count"] = round(time.time() - t0, 3)

    t0 = time.time()
    n_cand = dedup.minhash_lsh_candidates(sigs, "doc_id", bands=16).count()
    phases["candidates_full"] = round(time.time() - t0, 3)
    sigs.unpersist()

    # end-to-end without persist reuse (the bench shape)
    t0 = time.time()
    sigs2 = dedup.minhash_signatures(
        corpus, "text", "doc_id", num_perm=64, shingle_n=3, bands=16
    ).persist()
    n2 = dedup.minhash_lsh_candidates(sigs2, "doc_id", bands=16).count()
    sigs2.unpersist()
    phases["end_to_end"] = round(time.time() - t0, 3)

    # fused single-shuffle candidates: no persist needed (one pass over sigs)
    t0 = time.time()
    sigs3 = dedup.minhash_signatures(
        corpus, "text", "doc_id", num_perm=64, shingle_n=3, bands=16
    )
    n3 = dedup.minhash_lsh_candidates_fused(sigs3, "doc_id", bands=16).count()
    phases["end_to_end_fused"] = round(time.time() - t0, 3)
    assert n3 == n2, (n3, n2)

    print(json.dumps({"cpus": CPUS, "n_docs": N_DOCS, "n_sigs": n_sigs,
                      "n_hot": n_hot, "n_cand": n_cand, "n2": n2,
                      "phases": phases}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
