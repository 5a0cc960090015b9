"""Measure the tx log's metadata overhead as versions accumulate.

The version-pointer design (jobs/txlog.py) re-reads the latest
manifest on every operation and lists the log directory to resolve
the head. Both are O(#versions) or O(manifest bytes); this study
measures where that actually starts to hurt and documents the dial
(vacuum retention / manifest checkpointing) — the same
measure-the-metadata discipline Delta's _last_checkpoint exists for.

Protocol: one table partitioned into 16 buckets; N successive
commits, each touching 4 buckets (the steady-state maintenance
shape). At checkpoints, record:
  - commit latency (stage excluded — pure manifest cost),
  - head-resolution latency (latest_version + manifest load),
  - manifest size on disk,
  - read-plan build time for a 1-bucket pruned read.

Run: PYTHONPATH=/root/repo python tools/txlog_scale.py [n_commits]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.session import get_spark


def main() -> int:
    n_commits = int(sys.argv[1]) if len(sys.argv) > 1 else 300
    spark = get_spark(app_name="txlog_scale")
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="txlog_scale_")
    t = TxTable(os.path.join(root, "tbl"))

    # base data: 16 buckets × 1k rows
    base = spark.range(16_000).select(
        (F.col("id") % 16).alias("bucket"),
        F.col("id").alias("k"),
        (F.col("id") * 3 % 997).cast("long").alias("v"),
    )
    staged = {}
    # pre-stage 4 delta variants so the commit loop measures ONLY the
    # manifest protocol, not parquet writes
    for i in range(4):
        delta = base.filter(F.col("bucket").isin([i, i + 4, i + 8, i + 12]))
        staged[i] = t.stage_files(delta, "bucket")

    checkpoints = sorted(
        {1, 10, 50, 100, 200, 1000, 2500, n_commits} - {0}
    )
    checkpoints = [c for c in checkpoints if c <= n_commits]
    results = []
    t.commit(t.stage_files(base, "bucket"))  # v0: full table
    for c in range(1, n_commits + 1):
        adds = staged[c % 4]
        tc0 = time.perf_counter()
        t.commit(
            adds,
            remove_partitions={c % 4, c % 4 + 4, c % 4 + 8, c % 4 + 12},
            batch_id=f"b{c}",
        )
        commit_ms = (time.perf_counter() - tc0) * 1000
        if c in checkpoints:
            tr0 = time.perf_counter()
            v = t.latest_version()
            m = t.manifest(v)
            resolve_ms = (time.perf_counter() - tr0) * 1000
            # the checkpoint-vs-listdir comparison: force the
            # bootstrap path (hint file absent → full directory scan)
            hint_path = os.path.join(t.log_dir, "_last_checkpoint")
            hint_body = None
            if os.path.exists(hint_path):
                with open(hint_path) as hf:
                    hint_body = hf.read()
                os.unlink(hint_path)
            tl0 = time.perf_counter()
            assert t.latest_version() == v
            listdir_ms = (time.perf_counter() - tl0) * 1000
            if hint_body is not None:
                with open(hint_path, "w") as hf:
                    hf.write(hint_body)
            # replay-path resolution (applied_version bisection over
            # the dense retained range — no listdir since r8)
            ta0 = time.perf_counter()
            assert t.applied_version(f"b{max(1, c // 2)}") is not None
            applied_ms = (time.perf_counter() - ta0) * 1000
            tp0 = time.perf_counter()
            df = t.read(spark, partitions={3})
            n_files = len(t.live_files(partitions={3}))
            plan_ms = (time.perf_counter() - tp0) * 1000
            size_kb = os.path.getsize(
                os.path.join(t.log_dir, f"{v:08d}.json")
            ) / 1024
            results.append(
                {
                    "versions": v + 1,
                    "commit_ms": round(commit_ms, 1),
                    "resolve_ms": round(resolve_ms, 1),
                    "resolve_listdir_ms": round(listdir_ms, 1),
                    "applied_version_ms": round(applied_ms, 1),
                    "plan_build_ms": round(plan_ms, 1),
                    "manifest_kb": round(size_kb, 1),
                    "files_one_bucket": n_files,
                }
            )
            print(json.dumps(results[-1]), flush=True)

    # correctness spot-check after the churn
    assert t.read(spark).count() == 16_000, "row count drifted"
    # vacuum back to 1 version and confirm still readable
    tv0 = time.perf_counter()
    deleted = t.vacuum(retain_versions=1)
    print(
        json.dumps(
            {
                "vacuum_deleted_files": deleted,
                "vacuum_ms": round((time.perf_counter() - tv0) * 1000, 1),
                "rows_after_vacuum": t.read(spark).count(),
            }
        ),
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
