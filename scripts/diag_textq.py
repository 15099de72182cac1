"""Attribute pages_text_quality cost across its three feature columns and
compare the split/replace-allocating forms against regexp_count forms, at two
parallelism levels.  Usage: python scripts/diag_textq.py [cores ...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def run(cores: int):
    from pyspark.sql import SparkSession, functions as F

    from yirgacheffe_spark import harness
    from yirgacheffe_spark.text import quality

    os.makedirs("/dev/shm/spark-local", exist_ok=True)
    spark = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(f"diag-textq-{cores}")
        .config("spark.sql.shuffle.partitions", str(max(2 * cores, 16)))
        .config("spark.sql.files.maxPartitionBytes", "8388608")
        .config("spark.local.dir", "/dev/shm/spark-local")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "48g")
    .config("spark.driver.extraJavaOptions", "-Xms48g -XX:+AlwaysPreTouch")  # pinned heap: see bench.py
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    path = harness.bench_pages(spark, SF_DIR, 400000, res=6)
    harness.prewarm_files([path])
    df = spark.read.parquet(path)
    t = F.col("text")

    # regexp_count variants (same values, no intermediate allocation)
    def token_count_rc(col):
        trimmed = F.trim(col)
        return F.when(F.length(trimmed) == 0, F.lit(0)).otherwise(
            F.regexp_count(trimmed, F.lit(r"\s+")) + 1
        )

    def quality_score_rc(col):
        tok = token_count_rc(col)
        length_term = F.least(tok / F.lit(100.0), F.lit(1.0))
        punct = F.regexp_count(col, F.lit(r"[.,!?;:]")) / F.greatest(
            F.length(col), F.lit(1)
        )
        punct_term = F.lit(1.0) - F.least(punct * F.lit(4.0), F.lit(1.0))
        trimmed = F.trim(col)
        compact_len = F.length(trimmed) - F.regexp_count(trimmed, F.lit(r"\s"))
        mtl = compact_len / F.greatest(tok, F.lit(1))
        word_term = F.when((mtl >= 2.5) & (mtl <= 12.0), F.lit(1.0)).otherwise(
            F.lit(0.5)
        )
        return F.round(length_term * punct_term * word_term, 6)

    cases = {
        "tokens_split": lambda: df.select(
            quality.token_count(t).alias("x")
        ).agg(F.sum("x")).collect(),
        "tokens_rc": lambda: df.select(
            token_count_rc(t).alias("x")
        ).agg(F.sum("x")).collect(),
        "quality_split": lambda: df.select(
            quality.quality_score(t).alias("x")
        ).agg(F.avg("x")).collect(),
        "quality_rc": lambda: df.select(
            quality_score_rc(t).alias("x")
        ).agg(F.avg("x")).collect(),
        "fingerprint": lambda: df.select(
            quality.fingerprint(t).alias("x")
        ).agg(F.count_distinct("x")).collect(),
        "all_split": lambda: df.select(
            quality.token_count(t).alias("a"),
            quality.quality_score(t).alias("b"),
            quality.fingerprint(t).alias("c"),
        ).agg(F.sum("a"), F.avg("b"), F.count_distinct("c")).collect(),
        "all_rc": lambda: df.select(
            token_count_rc(t).alias("a"),
            quality_score_rc(t).alias("b"),
            quality.fingerprint(t).alias("c"),
        ).agg(F.sum("a"), F.avg("b"), F.count_distinct("c")).collect(),
    }

    # equality check once
    a = df.select(quality.token_count(t).alias("x")).agg(F.sum("x")).collect()[0][0]
    b = df.select(token_count_rc(t).alias("x")).agg(F.sum("x")).collect()[0][0]
    qa = df.select(quality.quality_score(t).alias("x")).agg(F.sum("x")).collect()[0][0]
    qb = df.select(quality_score_rc(t).alias("x")).agg(F.sum("x")).collect()[0][0]
    print(f"equal: tokens {a == b} ({a} vs {b}), quality {qa == qb} ({qa} vs {qb})")

    out = {}
    for name, fn in cases.items():
        fn()  # warm
        ts = []
        for _ in range(3):
            spark.sparkContext._jvm.System.gc()
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        out[name] = round(min(ts), 3)
    print(cores, out)
    spark.stop()
    return out


if __name__ == "__main__":
    for c in [int(x) for x in (sys.argv[1:] or ["32"])]:
        run(c)
