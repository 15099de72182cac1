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


def test_sessionization_late_within_watermark_no_split(spark, tmp_path):
    """An out-of-order event that is late but inside the watermark must merge
    into the existing session without rewinding its end: the gap test runs
    against the running max event time, so a later batch [11:10, 12:40] with
    state last=12:00 and a 30-minute gap yields ONE session ending 12:00 and
    a fresh session at 12:40 — not a spurious split at 11:10."""
    import pandas as pd

    from yirgacheffe_spark.streaming import sessions

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    day = pd.Timestamp("2026-01-01")

    def write(rows):
        pdf = pd.DataFrame(rows, columns=["user_id", "ts", "value"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(feed)

    t = lambda hhmm: day + pd.Timedelta(hours=int(hhmm[:2]), minutes=int(hhmm[2:]))
    write([(1, t("1155"), 1.0), (1, t("1200"), 1.0)])
    # 11:10 is older than state's last (12:00) but newer than the watermark
    # (11:00): in-session late event.  12:40 is 40min past 12:00: new session.
    write([(1, t("1110"), 4.0), (1, t("1240"), 8.0)])
    # Far-future row advances the watermark past everything: timeouts flush.
    write([(2, day + pd.Timedelta(days=1), 0.5)])

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
    rows = spark.read.parquet(out).where("user_id = 1").collect()
    got = {
        (r["n_events"], r["total_value"],
         str(r["session_start"])[11:16], str(r["session_end"])[11:16])
        for r in rows
    }
    # Merged session: 3 events, start widened to 11:10, end stays 12:00.
    assert (3, 6.0, "11:10", "12:00") in got, got
    assert (1, 8.0, "12:40", "12:40") in got, got
    for r in rows:
        assert r["session_start"] <= r["session_end"]


def test_sessionization_key_schema_follows_source(spark, tmp_path):
    """A string key column with a non-default name keeps its name and type in
    the output schema (previously hardcoded 'user_id long')."""
    import pandas as pd

    from yirgacheffe_spark.streaming import sessions

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    day = pd.Timestamp("2026-01-01")

    pdf = pd.DataFrame(
        [("a.example", day, 1.0), ("a.example", day + pd.Timedelta(minutes=5), 2.0),
         ("zz.example", day + pd.Timedelta(days=2), 0.1)],
        columns=["host", "ts", "value"],
    )
    spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(feed)

    stream = spark.readStream.schema(
        "host string, ts timestamp, value double"
    ).parquet(feed)
    df = sessions.sessionize_stream(stream, gap_minutes=30, key_col="host")
    assert dict(df.dtypes)["host"] == "string"
    q = (
        df.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.read.parquet(out)
    assert dict(got.dtypes)["host"] == "string"
    assert {(r["host"], r["n_events"]) for r in got.collect()} >= {("a.example", 2)}


def test_dedup_ingest_stream_admits_only_fresh(spark, tmp_path):
    """Continuous deduplicated ingest: batch-internal near-dups collapse to
    one representative; later files' near-dups of ALREADY-ACCEPTED docs are
    rejected via the stored signature index."""
    import pandas as pd

    from yirgacheffe_spark.streaming import dedup_ingest

    feed = str(tmp_path / "feed")
    out = str(tmp_path / "out")
    index = str(tmp_path / "index")
    ckpt = str(tmp_path / "ckpt")

    base = [
        "the quick brown fox jumps over the lazy dog again and again today",
        "pack my box with five dozen liquor jugs for the long journey home",
        "sphinx of black quartz judge my vow before the cold winter comes",
    ]

    def write(rows):
        pdf = pd.DataFrame(rows, columns=["doc_id", "text"])
        spark.createDataFrame(pdf).coalesce(1).write.mode("append").parquet(feed)

    # File 1: two internal near-dups (0 and 1) + one unique.
    write([(0, base[0] + " x"), (1, base[0] + " y"), (2, base[1] + " z")])
    # File 2: a near-dup of an accepted doc, and one genuinely new doc.
    write([(10, base[0] + " w"), (11, base[2] + " q")])

    stream = spark.readStream.schema("doc_id long, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(feed)
    q = dedup_ingest.dedup_ingest_stream(stream, out, index, ckpt)
    q.awaitTermination()

    got = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    # batch 1 keeps 0 (smallest of the 0/1 cluster) and 2; batch 2 rejects
    # 10 (near-dup of accepted 0) and keeps 11.
    assert got == [0, 2, 11], got
    # the signature index covers exactly the accepted documents
    idx_ids = sorted(r["doc_id"] for r in spark.read.parquet(index).collect())
    assert idx_ids == [0, 2, 11]


def test_dedup_ingest_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once: replaying a batch id must reproduce
    its output, NOT self-match against its own partially-committed index
    partition and delete everything (the data-loss failure a naive
    read-everything index scan produces)."""
    import pandas as pd

    from yirgacheffe_spark.streaming.dedup_ingest import _process_batch

    out = str(tmp_path / "out")
    index = str(tmp_path / "index")

    def batch(rows):
        return spark.createDataFrame(
            pd.DataFrame(rows, columns=["doc_id", "text"])
        )

    args = (out, index, "text", "doc_id", 64, 16, 3, 0.8)
    b0 = batch([(0, "the quick brown fox jumps over the lazy dog today"),
                (1, "pack my box with five dozen liquor jugs right now")])
    b1 = batch([(10, "sphinx of black quartz judge my vow this winter")])

    _process_batch(b0, 0, *args)
    _process_batch(b1, 1, *args)
    first = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert first == [0, 1, 10]

    # crash-replay of batch 1: identical output, nothing deleted
    _process_batch(b1, 1, *args)
    again = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert again == [0, 1, 10]

    # and replaying batch 0 (whose index partition also exists) too
    _process_batch(b0, 0, *args)
    assert sorted(r["doc_id"] for r in spark.read.parquet(out).collect()) == [0, 1, 10]
