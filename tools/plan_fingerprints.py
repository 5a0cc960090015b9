"""Physical-plan fingerprint golden file — the shuffle-regression
harness.

Every `groupBy`/`join`/`window`/`distinct` is a potential Exchange,
and an accidental extra Exchange is invisible at sf0.01 while costing
a full data reshuffle at 100 TB. This tool records, for every
front-window query (`queries/__init__.py::PRIORITY`), the count of
scale-critical physical operators in its (pre-AQE) plan; the paired
test (`tests/test_plan_fingerprints.py`) fails when a count drifts.

Regenerate intentionally after a plan-changing edit:

    PYTHONPATH=. python tools/plan_fingerprints.py

The session config here mirrors tests/conftest.py (local[4], 4
shuffle partitions) so the golden and the test see identical plans.
"""

from __future__ import annotations

import json
import os

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "plan_fingerprints.json")

# Operators whose counts are scale contracts. Exchange = shuffle;
# BroadcastExchange separates broadcast from shuffle traffic;
# CartesianProduct / BroadcastNestedLoopJoin are the quadratic joins
# that must never appear by accident; SortMergeJoin vs
# BroadcastHashJoin records the join strategy choice.
MARKERS = (
    "Exchange hashpartitioning",
    "Exchange rangepartitioning",
    "Exchange SinglePartition",
    "BroadcastExchange",
    "CartesianProduct",
    "BroadcastNestedLoopJoin",
    "SortMergeJoin",
    "BroadcastHashJoin",
)


def fingerprint(plan: str) -> dict[str, int]:
    return {m: plan.count(m) for m in MARKERS if plan.count(m)}


def reset_plan_state(spark) -> None:
    """Plans are fingerprinted from a DEFINED cache state: an
    InMemoryRelation substitution (sids cache, band-table persist)
    prints different operator counts before vs after materialization,
    so a fingerprint taken mid-session drifts from one taken fresh.
    Both the golden generator and the pinning test clear all
    persisted state first — the pinned shape is the fresh-session
    plan."""
    from nfl_data_pipeline_spark.operators.dedup import clear_sids_cache

    clear_sids_cache()
    spark.catalog.clearCache()


def fingerprint_of(spark, spec, sf_dir: str) -> dict[str, int]:
    reset_plan_state(spark)
    df = spec.spark(spark, sf_dir)
    return fingerprint(df._jdf.queryExecution().executedPlan().toString())


def compute_all(spark, sf_dir: str) -> dict[str, dict[str, int]]:
    from nfl_data_pipeline_spark.queries import PRIORITY, all_queries

    qs = all_queries()
    out = {}
    window = [n for n in PRIORITY if n in qs][:50]
    for name in window:
        out[name] = fingerprint_of(spark, qs[name], sf_dir)
    return out


def main() -> None:
    from nfl_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="plan-fingerprints", master="local[4]", shuffle_partitions=4
    )
    spark.sparkContext.setLogLevel("ERROR")
    fps = compute_all(spark, "/root/testdata/sf0.01")
    with open(GOLDEN_PATH, "w") as f:
        json.dump(fps, f, indent=1, sort_keys=True)
    total = sum(
        v.get("Exchange hashpartitioning", 0)
        + v.get("Exchange rangepartitioning", 0)
        + v.get("Exchange SinglePartition", 0)
        for v in fps.values()
    )
    print(f"wrote {GOLDEN_PATH}: {len(fps)} queries, {total} shuffles total")
    spark.stop()


if __name__ == "__main__":
    main()
