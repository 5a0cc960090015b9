"""Per-batch floor decomposition of the most expensive bench key,
``pipeline_incremental_curation`` (VERDICT r10 next #7): attribute the
~17 s official cost to its parts — gate COMPUTE (funnel flags +
near-dup verdicts), tx COMMIT floor (manifest swaps + file staging),
and the accounting merges — so a future regression on this key is
attributable without re-profiling.

Method: wrap the chain's stage functions and the TxTable
staging/commit primitives with timing accumulators (lock-guarded —
the accounting merges run in a thread pool), then run the exact bench
shape: two half-corpus batches of the sf documents table through
``process_curation_batch`` with track_frequent=True. Stage times can
overlap (the merges are concurrent), so the per-stage sum may exceed
batch wall — both are reported.

Usage: python tools/curation_floor.py
Prints one JSON line; numbers recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

_ACC: dict[str, float] = {}
_N: dict[str, int] = {}
_LOCK = threading.Lock()


def _timed(name: str, fn):
    def w(*a, **k):
        t0 = time.perf_counter()
        try:
            return fn(*a, **k)
        finally:
            dt = time.perf_counter() - t0
            with _LOCK:
                _ACC[name] = _ACC.get(name, 0.0) + dt
                _N[name] = _N.get(name, 0) + 1

    return w


def main() -> None:
    from pyspark.sql import functions as F

    from nfl_data_pipeline_spark.catalog import load
    from nfl_data_pipeline_spark.jobs.txlog import TxTable
    from nfl_data_pipeline_spark.session import get_spark
    from nfl_data_pipeline_spark.streaming import curation as cur

    # tx primitives: staging (the Spark write) vs commit (the
    # manifest swap) — "commit floor" in the verdict's sense is both.
    # Staging is additionally keyed by table so the floor attributes
    # to a specific state table, not just "the tx layer".
    _orig_stage = TxTable.stage_files

    def _stage(self, *a, **k):
        t0 = time.perf_counter()
        try:
            return _orig_stage(self, *a, **k)
        finally:
            dt = time.perf_counter() - t0
            key = f"tx_stage[{os.path.basename(self.root)}]"
            with _LOCK:
                for kk in ("tx_stage_files", key):
                    _ACC[kk] = _ACC.get(kk, 0.0) + dt
                    _N[kk] = _N.get(kk, 0) + 1

    TxTable.stage_files = _stage
    TxTable.commit = _timed("tx_commit", TxTable.commit)

    # chain stages, patched at the curation module's import sites
    cur.process_funnel_batch = _timed(
        "stage_funnel_gates", cur.process_funnel_batch
    )
    cur.process_neardup_batch = _timed(
        "stage_neardup_gate", cur.process_neardup_batch
    )
    cur.merge_grouped_sums = _timed(
        "acct_near_counts", cur.merge_grouped_sums
    )
    from nfl_data_pipeline_spark.streaming import frequent, stats

    stats.update_histogram_state = _timed(
        "acct_len_hist", stats.update_histogram_state
    )
    frequent.update_frequent_state = _timed(
        "acct_frequent", frequent.update_frequent_state
    )

    spark = get_spark(app_name="curation-floor")
    spark.sparkContext.setLogLevel("ERROR")
    os.environ.setdefault("SPARK_GRAFT_CACHE", "1")
    docs = load(spark, SF_DIR, "documents")

    # bench-equivalent warm-up: one throwaway mini-chain pays the
    # JVM/codegen/python-worker storm so batch 1 isn't billed for it
    import shutil
    import tempfile

    warm = tempfile.mkdtemp(prefix="curfloor_warm_")
    try:
        wstate = cur.CurationState(
            os.path.join(warm, "state"), track_frequent=True
        )
        cur.process_curation_batch(
            spark, docs.limit(500), wstate, "warm-0"
        )
    finally:
        shutil.rmtree(warm, ignore_errors=True)
    with _LOCK:
        _ACC.clear()
        _N.clear()

    scratch = tempfile.mkdtemp(prefix="curfloor_")
    walls = []
    try:
        state = cur.CurationState(
            os.path.join(scratch, "state"), track_frequent=True
        )
        for i in range(2):
            batch = docs.filter(F.col("doc_id") % 2 == i)
            t0 = time.perf_counter()
            cur.process_curation_batch(spark, batch, state, f"floor-{i}")
            walls.append(round(time.perf_counter() - t0, 3))
    finally:
        shutil.rmtree(scratch, ignore_errors=True)

    # stage_funnel_gates INCLUDES its own tx staging/commits; report
    # the raw accumulators and let SCALING.md do the arithmetic
    out = {
        "sf_dir": SF_DIR,
        "batch_walls": walls,
        "stages_sec": {k: round(v, 3) for k, v in sorted(_ACC.items())},
        "calls": _N,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
