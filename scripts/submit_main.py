"""Cluster entrypoint: ``spark-submit --py-files dist/yirgacheffe_spark.zip``.

Thin wrappers over the public package API, operating on user-supplied
tables (any Spark-readable path: parquet dirs locally, s3://..., an
Iceberg table via ``--format iceberg`` when the cluster has the runtime
jars).  The session comes from ``getOrCreate()`` so master/executors/
memory are whatever the ``spark-submit`` invocation says — nothing here
assumes local mode.

Jobs:

  enrich   --input PAGES --output DIR [--res 7] [--s2-level L]
           extract text + geocode + cell-assign an (url, warc_ts, html,
           text, lang) crawl table — one mapInPandas pass, no shuffle.
           --s2-level additionally emits a genuine S2 cell id column
           (``s2_cell``) so the output joins against tables with stored
           S2 keys.
  curate   --input DOCS --output DIR [--min-quality F] [--near-dup T]
           the one-call curation pipeline (exact dedup, boilerplate,
           quality floor, MinHash near-dup clusters).
  pip      --input POINTS --polygons POLYS --output DIR [--res 5]
           point-in-polygon join; POINTS needs lat/lng (+cell optional),
           POLYS needs poly_id/geom_wkt.
  knn      --input POINTS --queries QUERIES --output DIR [--k 10] [--res 6]
           k nearest points per query row (query_id, lat, lng).
  raster-sum --input TILE_TABLE
           sum a stored raster tile table (prints the scalar).

Example:

    python scripts/make_pyfiles.py
    spark-submit --master spark://head:7077 --num-executors 200 \
        --py-files dist/yirgacheffe_spark.zip scripts/submit_main.py \
        enrich --input s3://crawl/pages/ --output s3://crawl/enriched/ --res 7
"""
from __future__ import annotations

import argparse
import sys


def _read(spark, path: str, fmt: str):
    return spark.read.format(fmt).load(path)


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("job", choices=["enrich", "curate", "pip", "knn", "raster-sum"])
    p.add_argument("--input", required=True)
    p.add_argument("--output")
    p.add_argument("--format", default="parquet")
    p.add_argument("--polygons")
    p.add_argument("--queries")
    p.add_argument("--res", type=int, default=7)
    p.add_argument("--s2-level", type=int, default=None,
                   help="also emit a genuine S2 cell id column at this level")
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--min-quality", type=float, default=0.1)
    p.add_argument("--near-dup", type=float, default=0.8)
    p.add_argument("--id-col", default="doc_id")
    p.add_argument("--text-col", default="text")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName(f"yirgacheffe-{args.job}").getOrCreate()

    if args.job == "enrich":
        from yirgacheffe_spark.spatial import pages

        out = pages.enrich_pages_df(
            _read(spark, args.input, args.format), res=args.res
        )
        if args.s2_level is not None:
            from yirgacheffe_spark.spatial import s2

            out = out.withColumn(
                "s2_cell", s2.s2_cell_column("lat", "lng", args.s2_level)
            )
    elif args.job == "curate":
        from yirgacheffe_spark.text import pipeline

        out, report = pipeline.curate_corpus(
            _read(spark, args.input, args.format),
            text_col=args.text_col,
            id_col=args.id_col,
            min_quality=args.min_quality,
            near_dup_threshold=args.near_dup,
            with_report=True,
        )
        for stage, rows in report:
            print(f"curate stage {stage}: {rows} rows")
    elif args.job == "pip":
        from yirgacheffe_spark.spatial import joins

        out = joins.point_in_polygon_join_df(
            spark,
            _read(spark, args.input, args.format),
            _read(spark, args.polygons, args.format),
            res=args.res,
        )
    elif args.job == "knn":
        from yirgacheffe_spark.spatial import joins

        out = joins.knn_join_df(
            spark,
            _read(spark, args.input, args.format),
            _read(spark, args.queries, args.format),
            k=args.k,
            res=args.res,
        )
    else:  # raster-sum
        import yirgacheffe_spark as yg

        layer = yg.read_raster(args.input)
        print(f"sum = {layer.sum(spark=spark)}")
        return 0

    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        print(f"rows = {out.count()}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
