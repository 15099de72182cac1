"""Continuously deduplicated ingest: a Structured-Streaming pipeline that
admits only documents that are near-duplicates of NOTHING accepted before.

Shape (the rolling-crawl production pattern):

* the ACCEPTED corpus lives at ``out_dir`` (parquet, partitioned by ingest
  batch) and its MinHash signature index at ``index_dir`` — the index is
  written once per accepted document and never re-bucketed;
* each micro-batch runs ``foreachBatch``: batch-internal dedup first
  (keep the smallest id per near-dup cluster), then the cross check
  against the stored index via the incremental candidate path
  (`text.dedup.minhash_lsh_candidates_incremental` — the batch's bucket
  set broadcasts, the index scan prunes to touched buckets), exact
  Jaccard verification against the accepted texts, and an anti-join;
* writes are idempotent under foreachBatch's at-least-once contract:
  each batch overwrites its own ``batch=<id>`` partition, so a replayed
  batch produces identical bytes instead of duplicates (the standard
  exactly-once recipe for foreachBatch sinks).

State never lives in the stream itself — the index IS the state, stored
as plain parquet, so the pipeline resumes from checkpoint + storage alone
and batch jobs can share the same index.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F


def dedup_ingest_stream(stream: DataFrame, out_dir: str, index_dir: str,
                        checkpoint_dir: str, text_col: str = "text",
                        id_col: str = "doc_id", num_perm: int = 64,
                        bands: int = 16, shingle_n: int = 3,
                        threshold: float = 0.8):
    """Start the deduplicating ingest; returns the StreamingQuery.

    ``stream`` must carry ``id_col`` and ``text_col``.  Accepted rows land
    under ``out_dir/batch=<id>/``; their signatures under
    ``index_dir/batch=<id>/``.
    """
    def process(batch_df: DataFrame, batch_id: int) -> None:
        _process_batch(batch_df, batch_id, out_dir, index_dir, text_col,
                       id_col, num_perm, bands, shingle_n, threshold)
    return (
        stream.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def _index_batches(spark, index_dir: str) -> "list[str]":
    """``batch=<id>`` partition names under ``index_dir``, probed through
    the Hadoop FileSystem API — the same layer the writes go through — so
    any scheme Spark can write (``s3a://``, ``hdfs://``, ``abfs://``,
    plain paths) is probed correctly.  A driver-local ``os.listdir`` would
    report "no index" on every object store and silently skip cross-batch
    dedup on exactly the storage a streaming sink normally targets."""
    jvm = spark._jvm  # noqa: SLF001 — public-in-practice Hadoop bridge
    path = jvm.org.apache.hadoop.fs.Path(index_dir)
    fs = path.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    if not fs.exists(path):
        return []
    return [
        st.getPath().getName()
        for st in fs.listStatus(path)
        if st.getPath().getName().startswith("batch=")
    ]


def _process_batch(batch_df: DataFrame, batch_id: int, out_dir: str,
                   index_dir: str, text_col: str, id_col: str,
                   num_perm: int, bands: int, shingle_n: int,
                   threshold: float) -> None:
    """One micro-batch of the deduplicating ingest (module-level so replay
    semantics are directly testable)."""
    from ..text import dedup  # pylint: disable=C0415

    spark = batch_df.sparkSession
    if not batch_df.take(1):
        return
    # 1. batch-internal near-dup clusters -> keep one representative.
    batch_pairs = dedup.minhash_dedup_pairs(
        batch_df, text_col, id_col, num_perm=num_perm, bands=bands,
        shingle_n=shingle_n, threshold=threshold,
    )
    kept = dedup.dedup_keep_cluster_representative(
        batch_df, batch_pairs, id_col
    )
    # 2. cross check against everything accepted so far — EXCLUDING any
    # partition this same batch id wrote before a crash: foreachBatch is
    # at-least-once, and a replayed batch reading its own
    # partially-committed output would self-match every document
    # (Jaccard(self, self) = 1) and overwrite its partition with an
    # empty frame, silently deleting accepted rows.
    index_exists = any(
        name != f"batch={batch_id}"
        for name in _index_batches(spark, index_dir)
    )
    if index_exists:
        idx_sigs = spark.read.parquet(index_dir).where(
            F.col("batch") != batch_id
        )
        accepted = spark.read.parquet(out_dir).where(
            F.col("batch") != batch_id
        ).select(F.col(id_col), F.col(text_col))
        kept = dedup.minhash_dedup_against_index(
            kept, idx_sigs, accepted, text_col, id_col,
            num_perm=num_perm, bands=bands, shingle_n=shingle_n,
            threshold=threshold,
        )
    # 3. idempotent writes: a replayed batch overwrites its own
    # partition with identical content (deterministic upstream).
    kept.write.mode("overwrite").parquet(
        os.path.join(out_dir, f"batch={batch_id}")
    )
    sigs = dedup.minhash_signatures(
        kept, text_col, id_col, num_perm, shingle_n, bands=bands
    )
    sigs.write.mode("overwrite").parquet(
        os.path.join(index_dir, f"batch={batch_id}")
    )
