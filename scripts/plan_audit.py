"""Physical-plan audit: assert the Catalyst properties the engine's design
depends on, and print the evidence.

Checks (each FAILS the script if violated):

1. Raster scans carry PushedFilters on (band, tile_y, tile_x) and prune
   columns (ReadSchema excludes payload-less metadata the kernel ignores).
2. The PIP candidate plan broadcast-joins (or inlines) the polygon side —
   no SortMergeJoin on the page table for a dim-sized polygon list.
3. The LSH near-dup production plan contains NO CartesianProduct /
   BroadcastNestedLoopJoin (all-pairs is the classic scale failure).
4. The kNN output plan is shuffle-light — the heavy one-shot disk join
   ran eagerly (broadcast side asserted by the test suite); what remains
   must hold no joins or parquet scans.
5. Whole-stage codegen covers the text-quality column pipeline (the JVM
   hot path stays fused).
6-10. Curation plans: scan-side sampling filter, JVM LM scoring,
   broadcast decontamination probe, Python-free URL canonical dedup,
   single-Arrow-batch Gopher signals.

Run: python scripts/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"


def plan_of(df) -> str:
    jvm = df.sparkSession._jvm  # noqa: SLF001
    return jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import yirgacheffe_spark as yg
    from yirgacheffe_spark import harness
    from yirgacheffe_spark.plans import executor as X
    from yirgacheffe_spark.spatial import joins, pages
    from yirgacheffe_spark.text import ann, dedup

    failures = []

    def check(name, ok, evidence=""):
        print(f"{'OK  ' if ok else 'FAIL'} {name}")
        if evidence:
            print("     " + evidence.strip().replace("\n", "\n     "))
        if not ok:
            failures.append(name)

    # 1. raster scan pushdown (JVM-scan path; the default manifest-scan
    # path bypasses the JVM scan entirely by shipping (file, row-group)
    # rows the kernel reads with pyarrow directly)
    os.environ["YG_MANIFEST_SCAN"] = "0"
    try:
        r = harness.lineitem_rasters(SF_DIR)
        df = X.tiles_dataframe(X._as_root(r["qty"] * 2), spark)  # noqa: SLF001
        plan = plan_of(df)
        pushed = [l for l in plan.splitlines() if "PushedFilters" in l]
        ok = any("tile_y" in l and "tile_x" in l for l in pushed)
        check("raster scan pushes tile-range filters to parquet", ok,
              pushed[0] if pushed else "(no PushedFilters line)")
    finally:
        del os.environ["YG_MANIFEST_SCAN"]

    # 2. PIP broadcast / inlined cover
    pts = harness.customer_points(spark, SF_DIR).withColumn(
        "cell", joins.cell_expr("lat", "lng", 5)
    )
    pip = joins.point_in_polygon_join(
        spark, pts,
        [{"poly_id": 1, "geom_wkt": "POLYGON ((0 10, 40 10, 40 50, 0 50, 0 10))"}],
        res=5,
    )
    plan = plan_of(pip)
    ok = "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    check("PIP plan has no sort-merge/cartesian join on the page side", ok)

    # 3. LSH near-dup: no all-pairs operator
    emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    lsh = ann.cosine_near_dup_pairs_lsh(emb, threshold=0.42, bits=4, tables=8)
    plan = plan_of(lsh)
    ok = "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
    check("LSH near-dup plan is crossJoin-free", ok)

    # 4. kNN disk join broadcasts the query side
    qdf = spark.range(4).selectExpr(
        "id AS query_id", "CAST(id * 10 - 20 + 0.5 AS DOUBLE) AS lat",
        "CAST(id * 30 - 60 + 0.5 AS DOUBLE) AS lng"
    )
    knn = joins.knn_join_df(spark, pts.selectExpr("c_custkey AS url", "lat", "lng", "cell"),
                            qdf, k=2, res=5, max_ring=8)
    plan = plan_of(knn)
    # The heavy candidate join ran eagerly inside knn_join_df (broadcast
    # disk side; asserted by the no-crossJoin test suite); the RETURNED
    # plan must be shuffle-light: one Exchange for the final rank, no
    # joins over the page table.
    ok = ("SortMergeJoin" not in plan and "CartesianProduct" not in plan
          and plan.count("Scan parquet") == 0)
    check("kNN output plan is shuffle-light (no joins/scans after the "
          "materialised one-shot disk job)", ok)

    # 5. whole-stage codegen on the JVM text pipeline
    from yirgacheffe_spark.text import quality
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    q = docs.select(
        quality.token_count(F.col("text")).alias("t"),
        quality.quality_score(F.col("text")).alias("q"),
        quality.fingerprint(F.col("text")).alias("fp"),
    )
    plan = plan_of(q)
    ok = "codegen id" in plan and "BatchEvalPython" not in plan
    check("text quality pipeline is whole-stage-codegen JVM (no Python)", ok)

    # 6. deterministic sampling pushes its hash filter into the scan and
    # stays Python-free (the curation filters run at 10^12-row scale).
    from yirgacheffe_spark.text import sampling
    samp = sampling.salted_sample(docs, 0.25, "doc_id", seed=3)
    plan = plan_of(samp)
    ok = ("BatchEvalPython" not in plan and "Exchange" not in plan
          and "Filter" in plan)
    check("salted_sample is a JVM scan-side filter (no Python, no shuffle)", ok)

    # 7. n-gram LM scoring: extraction + model join stay JVM-side; the only
    # Python in the plan would be a regression (everything is column algebra).
    from yirgacheffe_spark.text import lm
    model = lm.train_ngram_counts(docs.limit(50), n=2)
    scored = lm.score_documents(docs, model, n=2)
    plan = plan_of(scored)
    ok = ("BatchEvalPython" not in plan and "CartesianProduct" not in plan
          and "BroadcastHashJoin" in plan)
    check("LM scoring plan: JVM n-gram extraction + broadcast model join", ok)

    # 8. decontamination: eval grams broadcast (benchmark-sized probe) and
    # the training side stays Python-free JVM n-gram algebra.
    evals = docs.limit(20).selectExpr("doc_id AS eval_id", "text")
    dec = dedup.contaminated_ids(docs, evals, eval_text_col="text", n=5)
    plan = plan_of(dec)
    ok = ("BatchEvalPython" not in plan and "CartesianProduct" not in plan
          and "BroadcastHashJoin" in plan)
    check("decontamination: JVM n-grams + broadcast eval probe", ok)

    # 9. URL canonical dedup: one window over the canonical key, no Python,
    # no cartesian (try_parse_url keeps everything JVM).
    from yirgacheffe_spark.spatial import pages as pages_mod
    from yirgacheffe_spark.text import urls
    pg = pages_mod.generate_pages(spark, 200).select("url").withColumn(
        "doc_id", F.xxhash64("url"))
    cu = urls.dedup_by_canonical_url(pg)
    plan = plan_of(cu)
    ok = ("BatchEvalPython" not in plan and "CartesianProduct" not in plan
          and "Window" in plan)
    check("URL canonical dedup: JVM window, no Python", ok)

    # 10. Gopher signals: exactly ONE Arrow-batched Python eval (the n-gram
    # repetition struct); every other signal is JVM column algebra.
    import re
    from yirgacheffe_spark.text import gopher
    sig = gopher.gopher_signals(docs)
    plan = plan_of(sig)
    # formatted explain lists each operator twice (tree + details):
    # count DISTINCT operator ids.
    n_arrow = len(set(re.findall(r"\((\d+)\) ArrowEvalPython", plan)))
    ok = n_arrow == 1 and "BatchEvalPython" not in plan
    check("gopher signals: one Arrow batch, rest JVM "
          f"(ArrowEvalPython x{n_arrow})", ok)

    # 11. DSIR weights: the (bucket, logratio) table joins BROADCAST (it is
    # <= buckets rows by construction) and the plan holds no cartesian /
    # nested-loop join and no Python eval — pure JVM hash path.
    from yirgacheffe_spark.text import lm
    tgt = docs.where(docs["lang"] == "en")
    tmod = lm.train_hashed_ngram_model(tgt, n=2, buckets=256)
    rmod = lm.train_hashed_ngram_model(docs, n=2, buckets=256)
    wplan = plan_of(lm.dsir_logweights(docs, tmod, rmod, n=2, buckets=256))
    ok = ("BroadcastHashJoin" in wplan
          and "CartesianProduct" not in wplan
          and "BroadcastNestedLoopJoin" not in wplan
          and "BatchEvalPython" not in wplan
          and "ArrowEvalPython" not in wplan)
    check("dsir weights: broadcast ratio join, JVM-only, no cartesian", ok)

    # 12. Bloom probe: ONE Arrow batch (the bit test); the positions are
    # JVM expressions, and the definite-new routing path has no join.
    from yirgacheffe_spark.text import bloom
    bf_m, bf_k = bloom.bloom_parameters(1000, fpp=0.01)
    bf = bloom.BloomFilter.build(
        docs.select(F.xxhash64("text").alias("h")), "h", bf_m, bf_k)
    probe_plan = plan_of(docs.where(~bf.might_contain(F.xxhash64("text"))))
    n_arrow = len(set(re.findall(r"\((\d+)\) ArrowEvalPython", probe_plan)))
    ok = (n_arrow == 1 and "Join" not in probe_plan
          and "BatchEvalPython" not in probe_plan)
    check(f"bloom probe: one Arrow batch, no join (ArrowEvalPython x{n_arrow})", ok)

    print("\nPLAN AUDIT:", "all checks passed" if not failures else f"FAILURES: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
