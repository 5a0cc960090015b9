"""Per-STAGE profiler over the Spark UI REST API (r11 VERDICT next
#7 / carry).

The r11 neardup-gate attribution timed ACTIONS by monkey-patching
DataFrame (and documented the pyspark-4 abstract-base trap that makes
that fragile). This tool attributes EXECUTOR time instead, with no
patching at all: Spark's local UI serves the complete per-stage
metric set at ``/api/v1/applications/{id}/stages`` — executor run
time, JVM GC, shuffle read/write bytes, input bytes, task counts —
the same numbers a SparkListener would accumulate, already
accumulated. ``profile(fn)`` snapshots completed stage ids, runs the
action, and diffs: every NEW stage belongs to the profiled action.

Works for any callable that triggers Spark jobs (bench keys, pipeline
steps, ad-hoc plans) and is reusable for future regressions: an
action whose wall grew but whose executorRunTime did not points at
scheduling/driver floor, not at the plan (exactly the r11
curation-floor distinction, now readable from one table).

Usage:
    python tools/stage_profile.py                 # profiles the
    # incremental-curation pipeline key per batch, cross-checks
    # stage sums against the action walls
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, "/root/repo")


def _stages(spark) -> list[dict]:
    base = spark.sparkContext.uiWebUrl
    app_id = spark.sparkContext.applicationId
    url = f"{base}/api/v1/applications/{app_id}/stages?status=complete"
    with urllib.request.urlopen(url, timeout=10) as r:
        return json.load(r)


def profile(spark, fn, label: str = "action") -> dict:
    """Run ``fn()`` and return its per-stage executor attribution.

    Returns {label, wall_s, stages: [...], exec_run_s, gc_s,
    shuffle_read_mb, shuffle_write_mb, input_mb} where ``stages`` are
    the stages COMPLETED by this action, heaviest first."""
    before = {s["stageId"] for s in _stages(spark)}
    t0 = time.perf_counter()
    fn()
    wall = time.perf_counter() - t0
    new = [s for s in _stages(spark) if s["stageId"] not in before]
    rows = sorted(
        (
            {
                "stage": s["stageId"],
                "tasks": s["numCompleteTasks"],
                "run_s": round(s["executorRunTime"] / 1000, 2),
                "gc_s": round(s["jvmGcTime"] / 1000, 2),
                "sh_read_mb": round(s["shuffleReadBytes"] / 2**20, 1),
                "sh_write_mb": round(s["shuffleWriteBytes"] / 2**20, 1),
                "input_mb": round(s["inputBytes"] / 2**20, 1),
                "name": s["name"].split("\n")[0][:60],
            }
            for s in new
        ),
        key=lambda r: -r["run_s"],
    )
    return {
        "label": label,
        "wall_s": round(wall, 2),
        "n_stages": len(rows),
        "exec_run_s": round(sum(r["run_s"] for r in rows), 2),
        "gc_s": round(sum(r["gc_s"] for r in rows), 2),
        "shuffle_read_mb": round(sum(r["sh_read_mb"] for r in rows), 1),
        "shuffle_write_mb": round(sum(r["sh_write_mb"] for r in rows), 1),
        "input_mb": round(sum(r["input_mb"] for r in rows), 1),
        "stages": rows,
    }


def print_profile(p: dict, top: int = 8) -> None:
    print(
        f"== {p['label']}: wall {p['wall_s']}s, {p['n_stages']} stages, "
        f"executor-run {p['exec_run_s']}s (gc {p['gc_s']}s), "
        f"shuffle r/w {p['shuffle_read_mb']}/{p['shuffle_write_mb']} MB, "
        f"input {p['input_mb']} MB"
    )
    for r in p["stages"][:top]:
        print(
            f"   stage {r['stage']:>4} tasks={r['tasks']:>3} "
            f"run={r['run_s']:>6.2f}s gc={r['gc_s']:>5.2f}s "
            f"shR={r['sh_read_mb']:>7.1f}MB shW={r['sh_write_mb']:>7.1f}MB "
            f"in={r['input_mb']:>7.1f}MB  {r['name']}"
        )


def main() -> None:
    import shutil
    import tempfile

    from nfl_data_pipeline_spark import benchpipes
    from nfl_data_pipeline_spark.session import get_spark

    # the engine session disables the UI (bench hygiene); the
    # profiler IS the UI consumer, so re-enable it for this session
    spark = get_spark(
        app_name="stage-profile",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if spark.sparkContext.uiWebUrl is None:
        raise SystemExit(
            "Spark UI is off in this session (an earlier getOrCreate "
            "pinned spark.ui.enabled=false) — run this tool in a "
            "fresh process"
        )
    scratch = tempfile.mkdtemp(prefix="stageprof_")
    warm = tempfile.mkdtemp(prefix="stageprof_warm_")
    try:
        # warm-up pass (own scratch): JVM + python-worker spin-up
        # otherwise lands on the first profiled stages
        benchpipes.incremental_curation(spark, warm)
        p = profile(
            spark,
            lambda: benchpipes.incremental_curation(spark, scratch),
            "pipeline_incremental_curation (both batches, warm)",
        )
        print_profile(p, top=12)
        # cross-check note: on local[32], wall ≈ max(exec_run/32,
        # driver+scheduling floor). A wall far above exec_run/32 is
        # the per-job floor the r11 curation-floor study priced — it
        # lives in scheduling, not in any stage below.
        print(
            f"cross-check: exec_run/32 = {p['exec_run_s'] / 32:.2f}s vs "
            f"wall {p['wall_s']}s -> "
            f"{p['wall_s'] - p['exec_run_s'] / 32:.2f}s outside executors"
        )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
        shutil.rmtree(warm, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
