"""Measure the funnel registry-probe strategies as the fingerprint
registry grows: plain left join (registry shuffled/broadcast every
batch) vs bloom-prefiltered probe (operators/bloom.py — bitmap test,
then a bucket-pruned join over only the maybe-present rows).

The registry is synthetic (md5 keys — the real fp shape) because the
quantity under test is pure probe cost, not the gates. Batch = 200k
fps, 10% planted dups, the rest new: the realistic shard mix where
the bloom's negative fast path should carry ~90% of rows.

Run:  python tools/funnel_bloom_scale.py [--sizes 1,4,8]  (millions)
Findings: SCALING.md §"Funnel registry probe".
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import functions as F  # noqa: E402

from nfl_data_pipeline_spark.operators.bloom import bloom_from_df  # noqa: E402
from nfl_data_pipeline_spark.session import get_spark  # noqa: E402
from nfl_data_pipeline_spark.streaming.funnel import (  # noqa: E402
    FunnelState,
    _bucket,
    registry_probe,
)

BATCH = 200_000
DUP_FRAC = 0.10


def synth_fps(spark, n, tag):
    return spark.range(n).select(
        F.md5(F.concat(F.lit(tag), F.col("id").cast("string"))).alias("fp"),
        F.col("id").alias("doc_id"),
    )


def build_registry(spark, state: FunnelState, n: int) -> None:
    reg = synth_fps(spark, n, "reg-").withColumn("bucket", _bucket("fp"))
    adds = state.fps.stage_files(reg, "bucket")
    bloom = bloom_from_df(reg, "fp", capacity=n, fpp=0.01)
    state.fps.commit(adds, meta={"bloom": state.save_fp_bloom(bloom)})


def probe_batch(spark, n):
    dups = synth_fps(spark, int(BATCH * DUP_FRAC), "reg-")  # ids 0..20k = dups
    news = synth_fps(spark, int(BATCH * (1 - DUP_FRAC)), f"new-{n}-").withColumn(
        "doc_id", F.col("doc_id") + 10_000_000
    )
    return dups.unionByName(news)


def run(spark, n_reg: int) -> dict:
    root = tempfile.mkdtemp(prefix="bloomscale")
    out = {"registry": n_reg}
    try:
        state = FunnelState(root, bloom_capacity=n_reg)
        build_registry(spark, state, n_reg)
        out["registry_mb"] = round(state.fps.live_bytes() / 1e6, 1)
        batch = probe_batch(spark, n_reg).localCheckpoint(eager=True)

        for label, kw in (
            ("plain", dict(use_bloom=False)),
            ("bloom", dict(use_bloom=True, bloom_engage_bytes=0)),
        ):
            st = FunnelState(root, bloom_capacity=n_reg, **kw)
            best = None
            for _ in range(2):
                t0 = time.time()
                joined, _bl = registry_probe(spark, st, batch)
                hits = joined.filter(F.col("first_doc").isNotNull()).count()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
            out[label] = round(best, 2)
            out[f"{label}_hits"] = hits
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", default="1,4,8")
    args = ap.parse_args()
    spark = get_spark(app_name="funnel-bloom-scale")
    spark.sparkContext.setLogLevel("ERROR")
    for m in args.sizes.split(","):
        res = run(spark, int(float(m) * 1_000_000))
        print(res, flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
