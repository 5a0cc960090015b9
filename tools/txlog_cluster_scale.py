"""Measure what clustering compaction buys: range-read cost over a
TxTable before vs after ``compact(cluster_by=...)``.

12M rows, 32 staged files, values arriving in hash order (the
realistic worst case — every file spans the full key range, manifest
stats skip nothing). After a cluster_files=32 clustering compaction
the same ``ranges=`` read should touch ~1/32 of the files.

Run: python tools/txlog_cluster_scale.py
Findings: SCALING.md §"Clustering compaction".
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from nfl_data_pipeline_spark.jobs.txlog import TxTable  # noqa: E402
from nfl_data_pipeline_spark.session import get_spark  # noqa: E402

N = 12_000_000
FILES = 32
RANGE = (1_000_000, 1_099_999)  # ~0.8% of the key space


def timed_range_read(spark, t: TxTable) -> tuple[float, int, int]:
    best = None
    for _ in range(2):
        t0 = time.time()
        df = t.read(spark, ranges={"k": RANGE})
        n = df.filter(
            (F.col("k") >= RANGE[0]) & (F.col("k") <= RANGE[1])
        ).count()
        best = min(best or 9e9, time.time() - t0)
    return best, n, len(t.live_files(ranges={"k": RANGE}))


def main() -> None:
    spark = get_spark(app_name="txlog-cluster-scale")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="txcluster")
    try:
        t = TxTable(root)
        df = spark.range(N).select(
            F.col("id").alias("k"),
            F.md5(F.col("id").cast("string")).alias("v"),
        ).orderBy("v")  # hash arrival order
        t.commit(t.stage_files(df.repartition(FILES), stats_cols=["k"]))

        sec, n, files = timed_range_read(spark, t)
        print(
            f"unclustered: {files}/{len(t.live_files())} files read, "
            f"{sec:.2f} s, {n} rows",
            flush=True,
        )

        t0 = time.time()
        t.compact(spark, stats_cols=["k"], cluster_by=["k"], cluster_files=FILES)
        print(f"clustering compaction: {time.time() - t0:.2f} s", flush=True)

        sec, n, files = timed_range_read(spark, t)
        print(
            f"clustered:   {files}/{len(t.live_files())} files read, "
            f"{sec:.2f} s, {n} rows",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
        spark.stop()


if __name__ == "__main__":
    main()
