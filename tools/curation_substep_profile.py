"""Per-SUB-STEP attribution of one incremental-curation batch: runs
the same chain as streaming/curation.process_curation_batch but with
tools/stage_profile.profile() around each stage of the chain, so the
wall/stage-count/executor-time split is readable per component
(funnel, survivors, neardup, accounting merges, read path).

Orchestration mirrors process_curation_batch — the operators called
are the real ones; only the profiling seams are added here.
"""

from __future__ import annotations

import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

from tools.stage_profile import print_profile, profile  # noqa: E402


def run_batches(spark, root: str, profiled_batch: int = 1) -> None:
    import os

    from pyspark.sql import functions as F

    from nfl_data_pipeline_spark.catalog import load
    from nfl_data_pipeline_spark.streaming.curation import (
        CurationState,
        _kept_ngrams,
        _surviving_docs,
        process_curation_batch,
        read_curation_counts,
    )
    from nfl_data_pipeline_spark.streaming.funnel import (
        process_funnel_batch,
    )
    from nfl_data_pipeline_spark.streaming.neardup import (
        process_neardup_batch,
    )
    from nfl_data_pipeline_spark.jobs.txlog import merge_grouped_sums
    from nfl_data_pipeline_spark.streaming.stats import (
        update_histogram_state,
    )
    from nfl_data_pipeline_spark.streaming.frequent import (
        update_frequent_state,
    )

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs_all = load(spark, sf_dir, "documents")
    state = CurationState(root + "_curation_state", track_frequent=True)

    for i in range(2):
        docs = docs_all.filter(F.col("doc_id") % 2 == i)
        if i != profiled_batch:
            process_curation_batch(spark, docs, state, f"bench-{i}")
            continue

        batch_id = f"bench-{i}"
        out = {}
        flagged_box = {}
        out["funnel"] = profile(
            spark,
            lambda: flagged_box.setdefault(
                "f", process_funnel_batch(spark, docs, state.funnel, batch_id)
            ),
            "funnel batch",
        )
        flagged = flagged_box["f"]
        surv_box = {}

        def _surv():
            s = _surviving_docs(docs, flagged).localCheckpoint(eager=True)
            surv_box["s"] = s

        out["survivors"] = profile(spark, _surv, "survivors ckpt")
        survivors = surv_box["s"]
        verd_box = {}
        out["neardup"] = profile(
            spark,
            lambda: verd_box.setdefault(
                "v",
                process_neardup_batch(
                    spark, survivors, state.neardup, batch_id, 0.5
                ),
            ),
            "neardup gate",
        )
        verdicts = verd_box["v"]
        kept_box = {}

        def _kept():
            kept_box["k"] = survivors.join(
                verdicts.filter(F.col("keep") == 1).select("doc_id"),
                "doc_id",
            ).localCheckpoint(eager=True)

        out["kept"] = profile(spark, _kept, "kept ckpt")
        kept = kept_box["k"]
        from nfl_data_pipeline_spark.streaming.curation import (
            _merge_curation_accounting,
        )

        out["accounting"] = profile(
            spark,
            lambda: _merge_curation_accounting(
                spark, kept, state, batch_id
            ),
            "near_counts + len_hist accounting (one collect)",
        )
        out["frequent"] = profile(
            spark,
            lambda: update_frequent_state(
                spark,
                _kept_ngrams(kept, state.frequent_ngram),
                "g",
                state.frequent,
                batch_id,
                capacity=state.frequent_capacity,
            ),
            "frequent fold",
        )
        for p in out.values():
            print_profile(p, top=4)

    p = profile(
        spark,
        lambda: read_curation_counts(spark, state)
        .write.format("noop")
        .mode("overwrite")
        .save(),
        "read_curation_counts",
    )
    print_profile(p, top=4)


def main() -> None:
    from nfl_data_pipeline_spark import benchpipes
    from nfl_data_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="curation-substep",
        extra_conf={"spark.ui.enabled": "true"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    warm = tempfile.mkdtemp(prefix="cursub_warm_")
    scratch = tempfile.mkdtemp(prefix="cursub_")
    try:
        benchpipes.incremental_curation(spark, warm)  # warm-up
        run_batches(spark, scratch)
    finally:
        shutil.rmtree(warm, ignore_errors=True)
        shutil.rmtree(scratch, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
