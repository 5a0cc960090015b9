"""Cost of the optional funnel repetition stage (judge r6 item 5):
the same three-micro-batch funnel pass as the bench's
`pipeline_incremental_funnel`, run with `use_repetition` off vs on,
min-of-N each. The stage is stateless (two extra aggregations over
the batch's words/bigrams), so its cost should be a batch-linear
increment with no state growth.

Usage: python tools/repetition_stage_cost.py [SF_DIR] [N_RUNS]
Prints one JSON line; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.session import get_spark
from nfl_data_pipeline_spark.streaming.funnel import (
    FunnelState,
    process_funnel_batch,
    read_funnel_counts,
)


def run_once(spark, docs, root: str, use_repetition: bool) -> float:
    state = FunnelState(root, use_repetition=use_repetition)
    t0 = time.perf_counter()
    for i in range(3):
        batch = docs.filter(F.col("doc_id") % 3 == i)
        process_funnel_batch(spark, batch, state, f"bench-{i}")
    read_funnel_counts(spark, state).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.perf_counter() - t0


def main(sf_dir: str, n_runs: int) -> dict:
    spark = get_spark(app_name="repetition-stage-cost")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, sf_dir, "documents")
    docs.count()  # warm scan + cache
    out = {"sf_dir": sf_dir, "runs": n_runs}
    for label, flag in (("off", False), ("on", True)):
        best = None
        for r in range(n_runs):
            root = tempfile.mkdtemp(prefix=f"repcost-{label}-")
            try:
                dt = run_once(spark, docs, root + "/f", flag)
            finally:
                shutil.rmtree(root, ignore_errors=True)
            best = dt if best is None else min(best, dt)
        out[label] = round(best, 3)
    out["ratio"] = round(out["on"] / out["off"], 3)
    print(json.dumps(out))
    spark.stop()
    return out


if __name__ == "__main__":
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    main(sf_dir, n_runs)
