"""Versioned-ANN-index scale study: per-batch ingest wall as the
index grows (assignment is a broadcast crossJoin — should stay flat),
query cost + manifest-pruned read fraction at small n_probe, rebuild
and forget-purge cost, at two corpus tiers.

Usage: PYTHONPATH=/root/repo python tools/annindex_scale.py [N_SMALL] [N_BIG]
Prints one JSON line per tier; recorded in SCALING.md.
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

from nfl_data_pipeline_spark.session import get_spark
from nfl_data_pipeline_spark.streaming.annindex import (
    AnnIndexState,
    ann_query,
    process_ann_batch,
    purge_ann_vectors,
    rebuild_ann_index,
)

DIM = 64
N_CELLS = 64
N_BATCHES = 4


def synth_vectors(spark, n: int, seed: int, start_id: int, spread: float = 0.5, anchor_sigma: float = 10.0):
    """Distributed synthetic clustered vectors (generation never
    touches the driver)."""
    from pyspark.sql.types import (
        ArrayType,
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("vec_id", LongType()),
            StructField("embedding", ArrayType(DoubleType())),
        ]
    )

    def gen(it):
        import numpy as np
        import pandas as pd

        rng0 = np.random.default_rng(seed)
        anchors = rng0.normal(0, anchor_sigma, (N_CELLS, DIM))
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rng = np.random.default_rng(seed * 1_000_003 + int(ids[0]))
            vecs = anchors[ids % N_CELLS] + rng.normal(
                0, spread, (len(ids), DIM)
            )
            yield pd.DataFrame(
                {
                    "vec_id": ids + start_id,
                    "embedding": list(vecs),
                }
            )

    return spark.range(n).repartition(32).mapInPandas(gen, schema)


def tier(spark, n_total: int) -> dict:
    root = tempfile.mkdtemp(prefix="annindex_scale_")
    out: dict = {"vectors": n_total, "dim": DIM, "n_cells": N_CELLS}
    try:
        state = AnnIndexState(root, n_cells=N_CELLS, fit_sample=4096)
        per = n_total // N_BATCHES
        walls = []
        for b in range(N_BATCHES):
            batch = synth_vectors(spark, per, seed=b, start_id=b * 10_000_000)
            t0 = time.perf_counter()
            process_ann_batch(spark, batch, state, f"b{b}")
            walls.append(round(time.perf_counter() - t0, 2))
        out["batch_walls_s"] = walls

        queries = synth_vectors(spark, 32, seed=99, start_id=900_000_000)
        for np_ in (2, 8):
            t0 = time.perf_counter()
            n = ann_query(spark, state, queries, k=10, n_probe=np_).count()
            out[f"query_np{np_}_s"] = round(time.perf_counter() - t0, 2)
            out[f"query_np{np_}_rows"] = n
        # pruned read economics: bytes for one query batch's probed
        # cells vs the full index — the probe set comes from the SAME
        # routing ann_query performs (results-derived cells would
        # under-count: the top-k concentrates in fewer cells than the
        # query actually read)
        from nfl_data_pipeline_spark.operators.similarity import (
            _assign_nearest,
        )
        from nfl_data_pipeline_spark.streaming.annindex import (
            _centroid_df,
        )

        total_bytes = sum(f["bytes"] for f in state.vectors.live_files())
        q4 = queries.limit(4).select(
            F.col("vec_id").alias("vid"),
            F.col("embedding").alias("vec"),
        )
        probed = {
            r["cid"]
            for r in _assign_nearest(
                q4, _centroid_df(spark, state.codebook()), probes=2
            ).select("cid").distinct().collect()
        }
        pruned_bytes = sum(
            f["bytes"]
            for f in state.vectors.live_files(partitions=probed)
        )
        out["index_bytes"] = total_bytes
        out["probed_bytes_4q_np2"] = pruned_bytes
        out["probed_frac"] = round(pruned_bytes / total_bytes, 3)

        doomed = [10_000_000 + i for i in range(100)]
        t0 = time.perf_counter()
        p = purge_ann_vectors(spark, state, doomed)
        out["purge_100_s"] = round(time.perf_counter() - t0, 2)
        out["purge_cells_touched"] = len(p["cells"])

        t0 = time.perf_counter()
        rebuild_ann_index(spark, state)
        out["rebuild_s"] = round(time.perf_counter() - t0, 2)
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def pq_tier(
    spark,
    n_total: int,
    n_probe: int = 8,
    k: int = 10,
    shortlists=(50, 200, 500, 1000, 2000),
    spread: float = 0.9,
    anchor_sigma: float = 1.0,
) -> dict:
    """Recall-vs-rerank-depth curve for the ``use_pq=True`` query
    path (VERDICT r8 #6): build a PQ-enabled index at the tier, then
    for each ``shortlist`` measure recall@k against (a) the EXACT
    brute-force top-k over the whole stored corpus and (b) the
    non-PQ ann_query at the SAME n_probe — (b) isolates the
    ADC-shortlist loss from the IVF probe-miss loss, since the PQ
    path can never beat its own probe set.

    Geometry: what matters after unit-normalization is the
    ANGULAR spread — spread / (anchor_sigma·√dim). The ingest tiers'
    0.5/10 geometry is ~0.006: every cluster member encodes to the
    SAME codes and ADC degenerates to id-tiebreak sampling (recall ≈
    shortlist / cell population — measured at both 20k and 200k,
    see SCALING). The defaults here match the r2 operator study's
    per-dim SNR ≈ 1 (sin-mixture, noise 0.9), the regime where the
    rerank-depth dial is meaningful."""
    from nfl_data_pipeline_spark.operators.similarity import (
        cosine_topk,
        recall_at_k,
    )

    root = tempfile.mkdtemp(prefix="annindex_pq_")
    out: dict = {
        "pq_tier": n_total,
        "dim": DIM,
        "n_cells": N_CELLS,
        "n_probe": n_probe,
        "k": k,
        "pq_m": 8,
        "pq_codes": 16,
    }
    try:
        state = AnnIndexState(
            root, n_cells=N_CELLS, fit_sample=4096, pq_m=8, pq_codes=16
        )
        per = n_total // N_BATCHES
        walls = []
        for b in range(N_BATCHES):
            batch = synth_vectors(
                spark, per, seed=b, start_id=b * 10_000_000,
                spread=spread, anchor_sigma=anchor_sigma,
            )
            t0 = time.perf_counter()
            process_ann_batch(spark, batch, state, f"b{b}")
            walls.append(round(time.perf_counter() - t0, 2))
        out["batch_walls_s"] = walls
        out["spread"] = spread
        out["anchor_sigma"] = anchor_sigma

        queries = synth_vectors(
            spark, 32, seed=99, start_id=900_000_000,
            spread=spread, anchor_sigma=anchor_sigma,
        ).localCheckpoint(eager=True)
        stored = state.vectors.read(spark).select(
            "vec_id", F.col("vec").alias("embedding")
        )
        exact = cosine_topk(queries, stored, k=k).localCheckpoint(eager=True)
        ivf = ann_query(
            spark, state, queries, k=k, n_probe=n_probe
        ).select(
            "q_id", "rank", F.col("vec_id").alias("c_id")
        ).localCheckpoint(eager=True)
        out["ivf_recall_vs_exact"] = round(recall_at_k(ivf, exact), 4)
        curve = {}
        for s in shortlists:
            t0 = time.perf_counter()
            approx = ann_query(
                spark,
                state,
                queries,
                k=k,
                n_probe=n_probe,
                use_pq=True,
                shortlist=s,
            ).select("q_id", "rank", F.col("vec_id").alias("c_id"))
            approx = approx.localCheckpoint(eager=True)
            curve[str(s)] = {
                "recall_vs_exact": round(recall_at_k(approx, exact), 4),
                "recall_vs_ivf": round(recall_at_k(approx, ivf), 4),
                "wall_s": round(time.perf_counter() - t0, 2),
            }
        out["pq_recall_curve"] = curve
        # the recall_vs_exact ceiling is the ROUTER's probe recall —
        # the incremental codebook was fit on batch 0's sample alone.
        # A rebuild refits on the current corpus: measure how much of
        # the gap it recovers (the staleness-threshold rationale).
        t0 = time.perf_counter()
        rebuild_ann_index(spark, state)
        out["rebuild_s"] = round(time.perf_counter() - t0, 2)
        ivf2 = ann_query(spark, state, queries, k=k, n_probe=n_probe).select(
            "q_id", "rank", F.col("vec_id").alias("c_id")
        )
        out["ivf_recall_after_rebuild"] = round(recall_at_k(ivf2, exact), 4)
        pq2 = ann_query(
            spark, state, queries, k=k, n_probe=n_probe,
            use_pq=True, shortlist=500,
        ).select("q_id", "rank", F.col("vec_id").alias("c_id"))
        out["pq500_recall_after_rebuild"] = round(
            recall_at_k(pq2, exact), 4
        )
        return out
    finally:
        shutil.rmtree(root, ignore_errors=True)


def main() -> int:
    n_small = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_big = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    mode = sys.argv[3] if len(sys.argv) > 3 else "all"
    spark = get_spark(app_name="annindex-scale")
    spark.sparkContext.setLogLevel("ERROR")
    if mode == "pq":
        print(json.dumps(pq_tier(spark, n_big)), flush=True)
        spark.stop()
        return 0
    small = tier(spark, n_small)
    print(json.dumps(small), flush=True)
    big = tier(spark, n_big)
    print(json.dumps(big), flush=True)
    if mode == "all":
        print(json.dumps(pq_tier(spark, n_big)), flush=True)
    ratio = {
        "rows_ratio": round(n_big / n_small, 1),
        "batch_wall_ratio": round(
            sum(big["batch_walls_s"]) / sum(small["batch_walls_s"]), 2
        ),
        "query_np2_ratio": round(
            big["query_np2_s"] / max(small["query_np2_s"], 1e-9), 2
        ),
    }
    print(json.dumps(ratio), flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
