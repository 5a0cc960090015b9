"""Right-to-be-forgotten scale study: delete_by_key_tx on a large
bucketed tx table.

The claim under test: deletion cost = one O(table) scan (finding the
matches — unavoidable for a non-partition key) + a REWRITE bounded by
the partitions actually holding matches, NOT a full-table rewrite.
Measures wall and rewritten-bytes for a small id set vs the
full-rewrite baseline, and verifies untouched files survive
byte-for-byte.

Usage: python tools/forget_scale.py [N_ROWS] [N_BUCKETS] [N_DELETE]
Prints one JSON line; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.forget import delete_by_key_tx
from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.session import get_spark


def main(n_rows: int, n_buckets: int, n_delete: int) -> dict:
    spark = get_spark(app_name=f"forget-scale-{n_rows}")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="forget_scale_")
    t = TxTable(os.path.join(root, "t"))
    df = spark.range(n_rows).select(
        F.pmod(F.xxhash64("id"), F.lit(n_buckets)).alias("bucket"),
        F.col("id").alias("doc_id"),
        F.md5(F.col("id").cast("string")).alias("payload"),
    )
    t.commit(t.stage_files(df, "bucket"), batch_id="b0")
    v0 = t.latest_version()
    bytes_before = t.live_bytes()
    files_before = {f["path"] for f in t.live_files(version=v0)}

    # delete a CLUSTERED id set (ids hashing into few buckets is not
    # controllable; take sequential ids — they spread over buckets,
    # the worst case for partition-scoping)
    ids = list(range(0, n_delete))
    t0 = time.perf_counter()
    res = delete_by_key_tx(spark, t, "doc_id", ids, "bucket", batch_id="d0")
    wall = round(time.perf_counter() - t0, 2)

    files_after = {f["path"] for f in t.live_files()}
    untouched_kept = len(files_before & files_after)
    rewritten_bytes = sum(
        f["bytes"] for f in t.live_files() if f["path"] not in files_before
    )
    n_after = t.read(spark).count()

    res_out = {
        "n_rows": n_rows,
        "n_buckets": n_buckets,
        "n_delete": n_delete,
        "wall_s": wall,
        "touched_partitions": res["touched_partitions"],
        "deleted_rows": res["deleted_rows"],
        "rows_after": n_after,
        "table_bytes": bytes_before,
        "rewritten_bytes": rewritten_bytes,
        "untouched_files_kept": untouched_kept,
        "files_total_before": len(files_before),
    }

    # ---- range-clustered layout (cluster_table_for_deletes): the
    # same table re-laid by doc_id range, then two delete shapes —
    # scattered ids (adversarial for ANY layout) and a contiguous
    # span (the realistic one-user/one-source purge, which hash
    # bucketing scatters over most buckets but ranges keep local).
    from nfl_data_pipeline_spark.jobs.forget import (
        cluster_table_for_deletes,
    )

    t2 = TxTable(os.path.join(root, "t2"))
    t2.commit(t2.stage_files(df, "bucket"), batch_id="b0")
    info = cluster_table_for_deletes(spark, t2, "doc_id", n_ranges=n_buckets)
    for shape, ids2 in (
        ("scattered", [i * (n_rows // n_delete) for i in range(n_delete)]),
        # +7 keeps the span disjoint from the scattered stride above
        ("contiguous", list(range(n_rows // 2 + 7, n_rows // 2 + 7 + n_delete))),
    ):
        files_b = {f["path"] for f in t2.live_files()}
        bytes_b = t2.live_bytes()
        t0 = time.perf_counter()
        r = delete_by_key_tx(
            spark, t2, "doc_id", ids2, "_fr", batch_id=f"d-{shape}"
        )
        w = round(time.perf_counter() - t0, 2)
        rewritten = sum(
            f["bytes"]
            for f in t2.live_files()
            if f["path"] not in files_b
        )
        res_out[f"clustered_{shape}"] = {
            "wall_s": w,
            "touched_partitions": r["touched_partitions"],
            "deleted_rows": r["deleted_rows"],
            "rewritten_bytes": rewritten,
            "table_bytes": bytes_b,
        }
    spark.stop()
    return res_out


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 12_000_000
    b = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    d = int(sys.argv[3]) if len(sys.argv) > 3 else 100
    print(json.dumps(main(n, b, d)))
