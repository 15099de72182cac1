"""Structured-streaming ingest: enrichment parity with batch, watermarked
windowed aggregation, and checkpointed exactly-once resume."""

import os

import pytest
from pyspark.sql import functions as F

from yirgacheffe_spark.spatial import pages
from yirgacheffe_spark.streaming import ingest


@pytest.fixture
def feed_dirs(tmp_path):
    return (
        str(tmp_path / "feed"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )


def _write_batch(spark, feed_dir, start, n, part):
    df = pages.generate_pages(spark, start + n).where(F.col("url").isNotNull())
    # generate_pages is id-range based; take the [start, start+n) slice by
    # regenerating and filtering on the deterministic timestamp order.
    batch = pages.generate_pages(spark, start + n)
    if start:
        earlier = pages.generate_pages(spark, start).select("url")
        batch = batch.join(earlier, "url", "left_anti")
    batch.coalesce(1).write.mode("append").parquet(feed_dir)


def test_stream_matches_batch_enrichment(spark, feed_dirs):
    feed, out, ckpt = feed_dirs
    _write_batch(spark, feed, 0, 300, 0)
    stream = ingest.enrich_stream(ingest.pages_file_stream(spark, feed), res=6)
    ingest.run_available(stream, out, ckpt)
    got = spark.read.parquet(out)
    assert got.count() == 300
    assert got.where("extracted != text").count() == 0
    batch = pages.enriched_pages(spark, 300, res=6)
    assert (
        got.select("url", "cell").exceptAll(batch.select("url", "cell")).count() == 0
    )


def test_stream_resume_is_exactly_once(spark, feed_dirs):
    feed, out, ckpt = feed_dirs
    _write_batch(spark, feed, 0, 200, 0)
    stream = ingest.enrich_stream(ingest.pages_file_stream(spark, feed), res=6)
    ingest.run_available(stream, out, ckpt)
    n1 = spark.read.parquet(out).count()
    assert n1 == 200

    # Second drain with NO new data: nothing reprocessed.
    ingest.run_available(
        ingest.enrich_stream(ingest.pages_file_stream(spark, feed), res=6), out, ckpt
    )
    assert spark.read.parquet(out).count() == 200

    # New files arrive; only they are processed.
    _write_batch(spark, feed, 200, 150, 1)
    ingest.run_available(
        ingest.enrich_stream(ingest.pages_file_stream(spark, feed), res=6), out, ckpt
    )
    got = spark.read.parquet(out)
    assert got.count() == 350
    assert got.select("url").distinct().count() == 350


def test_windowed_lang_counts_schema(spark, feed_dirs):
    feed, out, ckpt = feed_dirs
    _write_batch(spark, feed, 0, 300, 0)
    stream = ingest.enrich_stream(ingest.pages_file_stream(spark, feed), res=6)
    agg = ingest.windowed_lang_counts(stream, window="1 hour", watermark="0 seconds")
    ingest.run_available(agg, out, ckpt)
    got = spark.read.parquet(out)
    assert set(got.columns) == {"win_start", "lang", "n", "n_cells"}
    # Batch oracle over the same window arithmetic (closed windows only; with
    # a 0s watermark and availableNow, all-but-final windows flush).
    batch = pages.enriched_pages(spark, 300, res=6)
    oracle = (
        batch.groupBy(F.window("warc_ts", "1 hour").alias("win"), "lang")
        .agg(F.count("*").alias("n"))
        .select(F.col("win.start").alias("win_start"), "lang", "n")
    )
    joined = got.join(oracle, ["win_start", "lang"], "inner")
    mism = joined.where(got["n"] != oracle["n"]).count()
    assert mism == 0


def test_stateful_sessionization(spark, tmp_path):
    """applyInPandasWithState session assembly: in-batch gaps close sessions
    immediately; the event-time watermark closes the rest via state timeout
    once later files advance it."""
    import pandas as pd

    from yirgacheffe_spark.streaming import sessions

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t0 = pd.Timestamp("2026-01-01 00:00:00")

    def write(rows, name):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(feed)

    # File 1: user 1 has two bursts separated by > gap (in-batch close);
    # user 2 one burst.
    write(
        [
            (1, t0, 1.0),
            (1, t0 + pd.Timedelta(minutes=5), 2.0),
            (1, t0 + pd.Timedelta(minutes=90), 4.0),
            (2, t0 + pd.Timedelta(minutes=1), 8.0),
        ],
        "f1",
    )
    # File 2: far-future row advances the watermark (1h tolerance) past
    # every earlier session's last+gap, so the open sessions time out.
    write([(3, t0 + pd.Timedelta(hours=12), 0.5)], "f2")

    stream = spark.readStream.schema(
        "user_id long, ts timestamp, value double"
    ).option("maxFilesPerTrigger", 1).parquet(feed)
    q = (
        sessions.sessionize_stream(stream, gap_minutes=30, watermark="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r["user_id"], r["n_events"], r["total_value"])
        for r in spark.read.parquet(out).collect()
    }
    # user 1: burst (2 events, 3.0) closed by in-batch gap, burst (1, 4.0)
    # closed by timeout; user 2: (1, 8.0) closed by timeout.
    assert (1, 2, 3.0) in got
    assert (1, 1, 4.0) in got
    assert (2, 1, 8.0) in got
