"""File-stream staging: turn a batch DataFrame into an ordered sequence of parquet
files that Structured Streaming's file source replays as micro-batches.

This is the test-harness analogue of the reference's mutation feed: the coprocessor
receives mutations one RPC at a time (HbaseDataSyncEsObserver.java:69 in
/root/reference) and buffers ≤10 000 per bulk flush (ElasticsearchBulkOperator.java:41);
here each staged file plays one such arrival burst, replayed by
``maxFilesPerTrigger=1`` in arrival order (file mtime order, which we control).
"""

from __future__ import annotations

import glob
import os
import shutil
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

REPO_ROOT = Path(__file__).resolve().parents[2]
SCRATCH = REPO_ROOT / ".scratch"


def scratch_dir(name: str) -> str:
    """Per-run scratch area inside the repo (never outside /root/repo)."""
    d = SCRATCH / name
    if d.exists():
        shutil.rmtree(d)
    d.mkdir(parents=True)
    return str(d)


def stage_ordered_batches(
    df: DataFrame, out_dir: str, n_batches: int, order_col: str = "ts"
) -> str:
    """Write ``df`` as ``n_batches`` parquet files in ``order_col`` order with
    strictly increasing mtimes, so the file source replays them as ordered
    micro-batches. Driver-side loop over n_batches (a handful) only — the data
    itself never passes through the driver."""
    stream_dir = os.path.join(out_dir, "stream")
    os.makedirs(stream_dir, exist_ok=True)
    # ntile over a global sort: fine at staging scale (test input), never a
    # production pattern — noted per SURVEY.md §7 scale posture.
    w = Window.orderBy(order_col, *[c for c in df.columns if c != order_col])
    sliced = df.withColumn("__b", F.ntile(n_batches).over(w))
    for i in range(1, n_batches + 1):
        tmp = os.path.join(out_dir, f"tmp_{i}")
        (
            sliced.filter(F.col("__b") == i)
            .drop("__b")
            .coalesce(1)
            .write.mode("overwrite")
            .parquet(tmp)
        )
        part = glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dst = os.path.join(stream_dir, f"batch-{i:04d}.parquet")
        shutil.move(part, dst)
        shutil.rmtree(tmp)
        os.utime(dst, (time.time() + i, time.time() + i))
    return stream_dir


def read_stream(spark: SparkSession, stream_dir: str, schema) -> DataFrame:
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
