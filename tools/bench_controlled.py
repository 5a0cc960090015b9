"""Judge-reproducible controlled perf harness: the SCALING.md
min-of-N protocol over the headline bench keys, as one command.

The official per-round bench (bench.py) is the artifact of record and
is now self-defending (min-of-2 everywhere + load stamps + per-key
spread), but adjudicating a suspicious key has so far meant re-running
it by hand. This tool encodes that protocol: N timed passes per key
(default 3) after the same warm-up bench.py uses, keeping min AND the
full sample list, with load averages stamped before and after — so a
controlled number is `python tools/bench_controlled.py --keys k1,k2`
instead of prose.

Prints one JSON line:
  {"metric": "controlled_min_of_n", "n": 3, "queries": {k: min},
   "samples": {k: [..]}, "load_start": [...], "load_end": [...],
   "sf": ...}

Pipeline keys (the benchpipes entries) are supported too; each pass
gets a fresh scratch dir so rebuild stays a cold write, and the keys
in one pass run in their dependency order regardless of the order
given on the command line.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_KEYS = (
    "pipeline_rebuild_1p2m,pipeline_incremental_append,"
    "pipeline_epa_panel,string_funcs,udf_model_score,"
    "asof_join_events,text_doc_profile,knn_arrow"
)

# benchpipes keys in dependency order (rebuild writes the dir the
# next two read), key -> benchpipes function name
PIPELINE_FNS = {
    "pipeline_rebuild_1p2m": "rebuild_1p2m",
    "pipeline_incremental_append": "incremental_append",
    "pipeline_epa_panel": "epa_panel_core",
    "pipeline_incremental_funnel": "incremental_funnel",
    "pipeline_incremental_curation": "incremental_curation",
    "knn_arrow": "knn_arrow",
    "embdedup_gate_arrow": "embdedup_gate_arrow",
    "bpe_tokenize": "bpe_tokenize",
    "pipeline_epoch_shards_1p2m": "epoch_shards_1p2m",
    "pipeline_corpus_assembly_1p2m": "corpus_assembly_1p2m",
}
PIPELINE_ORDER = list(PIPELINE_FNS)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keys", default=DEFAULT_KEYS)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    args = ap.parse_args()
    os.environ["SPARK_GRAFT_SF_DIR"] = args.sf_dir
    os.environ.setdefault("SPARK_GRAFT_CACHE", "1")

    from nfl_data_pipeline_spark import benchpipes
    from nfl_data_pipeline_spark.catalog import FIXTURE_TABLES, load
    from nfl_data_pipeline_spark.queries import all_queries
    from nfl_data_pipeline_spark.session import get_spark

    spark = get_spark(app_name="bench-controlled")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_queries()
    for t in FIXTURE_TABLES:
        if os.path.exists(os.path.join(args.sf_dir, f"{t}.parquet")):
            load(spark, args.sf_dir, t)

    def run(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # same warm-up as bench.py: JVM/codegen + the Python worker pool
    run(specs["revenue_by_nation"].spark(spark, args.sf_dir))
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.DoubleType())
    def _noop_score(x):
        import numpy as np  # noqa: F401
        import pandas as pd

        return pd.Series([0.0] * len(x))

    n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    run(
        spark.range(n_parts * 10)
        .repartition(n_parts)
        .select(_noop_score("id"))
    )

    keys = [k.strip() for k in args.keys.split(",") if k.strip()]
    pipe_keys = [k for k in PIPELINE_ORDER if k in keys]
    query_keys = [k for k in keys if k not in PIPELINE_ORDER]
    unknown = [k for k in query_keys if k not in specs]
    if unknown:
        raise SystemExit(f"unknown keys: {unknown}")

    load_start = list(os.getloadavg())
    samples: dict[str, list[float]] = {k: [] for k in keys}
    scratch = tempfile.mkdtemp(prefix="bench_controlled_")
    try:
        for pass_ix in range(args.n):
            for name in query_keys:
                t0 = time.perf_counter()
                run(specs[name].spark(spark, args.sf_dir))
                samples[name].append(
                    round(time.perf_counter() - t0, 4)
                )
            if pipe_keys:
                base = f"{scratch}/pass{pass_ix}/pbp"
                # rebuild is a hard prerequisite of the readers; run
                # it un-timed when not itself requested
                if "pipeline_rebuild_1p2m" not in pipe_keys and any(
                    k in pipe_keys
                    for k in (
                        "pipeline_incremental_append",
                        "pipeline_epa_panel",
                    )
                ):
                    benchpipes.rebuild_1p2m(spark, base)
                for name in pipe_keys:
                    fn = getattr(benchpipes, PIPELINE_FNS[name])
                    t0 = time.perf_counter()
                    fn(spark, base)
                    samples[name].append(
                        round(time.perf_counter() - t0, 4)
                    )
                shutil.rmtree(
                    f"{scratch}/pass{pass_ix}", ignore_errors=True
                )
    finally:
        shutil.rmtree(scratch, ignore_errors=True)
    load_end = list(os.getloadavg())

    sf = args.sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "controlled_min_of_n",
                "n": args.n,
                "queries": {k: min(s) for k, s in samples.items()},
                "samples": samples,
                "load_start": load_start,
                "load_end": load_end,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
