"""Per-partition lineage + checkpoint/resume for batch jobs.

Every unit of work (a cell range, a tile range, an id range) writes its
output under ``<path>/data/task=<id>/`` and then appends one lineage row
``(task_id, rows, t_start, t_end, wall_s, inputs)`` to ``<path>/_lineage/``.
A re-run anti-joins the task list against the recorded lineage and processes
only the missing tasks — the whole job is resumable and idempotent (tasks are
deterministic functions of their id; a retried task overwrites its own
directory before its lineage row lands).

This replaces the reference's 285-line fork/shared-memory apparatus
(``_operators/__init__.py:1211-1403``): Spark executors provide the
parallelism; lineage rows provide the resumability the north rule asks for.
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def _hadoop_fs(spark: SparkSession, path: str):
    """(FileSystem, Path, jvm) for ``path`` through the same Hadoop layer
    the data writes go through — a driver-local os.listdir would report
    "nothing recorded" on any object store (s3a://, hdfs://, abfs://) and
    silently re-run every task; same failure mode the streaming dedup
    ingest had before its Hadoop-FS port."""
    jvm = spark._jvm  # noqa: SLF001 — public-in-practice Hadoop bridge
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())  # noqa: SLF001
    return fs, jpath, jvm

LINEAGE_SCHEMA = "task_id long, rows long, t_start double, t_end double, wall_s double, inputs string"


class CheckpointedRun:
    def __init__(self, spark: SparkSession, path: str):
        self.spark = spark
        self.path = path
        self.data_dir = os.path.join(path, "data")
        self.lineage_dir = os.path.join(path, "_lineage")
        fs, _, jvm = _hadoop_fs(spark, path)
        for d in (self.data_dir, self.lineage_dir):
            fs.mkdirs(jvm.org.apache.hadoop.fs.Path(d))

    def _lineage_records(self) -> list[dict]:
        fs, _, jvm = _hadoop_fs(self.spark, self.lineage_dir)
        glob = jvm.org.apache.hadoop.fs.Path(
            os.path.join(self.lineage_dir, "task-*.json")
        )
        records = []
        for status in sorted(fs.globStatus(glob) or [],
                             key=lambda st: st.getPath().getName()):
            stream = fs.open(status.getPath())
            try:
                data = bytes(
                    jvm.org.apache.commons.io.IOUtils.toByteArray(stream)
                )
            finally:
                stream.close()
            records.append(json.loads(data.decode("utf-8")))
        return records

    def completed_tasks(self) -> set[int]:
        return {r["task_id"] for r in self._lineage_records()}

    def lineage(self) -> pd.DataFrame:
        return pd.DataFrame(self._lineage_records())

    def run(
        self,
        task_ids: list[int],
        task_fn: Callable[[SparkSession, int], DataFrame],
        inputs_desc: str = "",
    ) -> DataFrame:
        """Execute every task not yet recorded; return the union of all task
        outputs (completed + fresh) as one DataFrame."""
        done = self.completed_tasks()
        pending = [t for t in task_ids if t not in done]
        for task_id in pending:
            t0 = time.time()
            out = task_fn(self.spark, task_id)
            task_dir = os.path.join(self.data_dir, f"task={task_id}")
            out.write.mode("overwrite").parquet(task_dir)
            rows = self.spark.read.parquet(task_dir).count()
            t1 = time.time()
            record = {
                "task_id": task_id,
                "rows": rows,
                "t_start": t0,
                "t_end": t1,
                "wall_s": t1 - t0,
                "inputs": inputs_desc,
            }
            # Write-then-rename through the Hadoop FS: the lineage row is
            # the commit point (single-file rename on HDFS/local; on object
            # stores the copy+delete rename is still all-or-nothing for one
            # small object).
            fs, _, jvm = _hadoop_fs(self.spark, self.lineage_dir)
            tmp = jvm.org.apache.hadoop.fs.Path(
                os.path.join(self.lineage_dir, f".task-{task_id}.json.tmp")
            )
            final = jvm.org.apache.hadoop.fs.Path(
                os.path.join(self.lineage_dir, f"task-{task_id}.json")
            )
            stream = fs.create(tmp, True)
            try:
                stream.write(json.dumps(record).encode("utf-8"))
            finally:
                stream.close()
            if fs.exists(final):
                fs.delete(final, False)
            # Hadoop rename reports failure as FALSE, not an exception —
            # an unchecked rename would silently skip the commit point and
            # the task would re-run on every resume forever.
            if not fs.rename(tmp, final):
                raise IOError(
                    f"lineage commit rename failed: {tmp} -> {final}"
                )
        return self.spark.read.parquet(os.path.join(self.data_dir, "task=*"))
