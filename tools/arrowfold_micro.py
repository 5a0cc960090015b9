"""Micro A/B of the exact-order Arrow kernels vs the interpreted SQL
folds they replace, timed through the noop sink on a warm session
(guide §1.4): executor-time attribution comes from the REST stage
profiler so the scheduling floor cannot mask the per-task story."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from tools.stage_profile import profile  # noqa: E402


def main() -> None:
    from pyspark.sql import functions as F

    from nfl_data_pipeline_spark.catalog import load
    from nfl_data_pipeline_spark.operators import arrowfold
    from nfl_data_pipeline_spark.operators.dedup import (
        _materialized_sids,
        with_minhash_signature,
    )
    from nfl_data_pipeline_spark.operators.hashing import (
        gate_minhash_perms,
        sp_dot,
    )
    from nfl_data_pipeline_spark.operators.similarity import (
        hyperplane_band_struct,
    )
    from nfl_data_pipeline_spark.session import get_spark

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        app_name="arrowfold-micro", extra_conf={"spark.ui.enabled": "true"}
    )
    spark.sparkContext.setLogLevel("ERROR")

    def run(df):
        df.write.format("noop").mode("overwrite").save()

    def timed(name, df, n=3):
        # warm once, then min-of-n wall + one profiled pass for exec
        run(df)
        walls = []
        for _ in range(n):
            t0 = time.time()
            run(df)
            walls.append(time.time() - t0)
        p = profile(spark, lambda: run(df), name)
        ex = p["exec_run_s"]
        print(
            f"{name:42s} wall(min/{n})={min(walls):6.3f}s "
            f"exec={ex:7.3f}s stages={len(p['stages'])}"
        )

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")
    perms = gate_minhash_perms(32)
    sids = _materialized_sids(docs, "text", 3)
    sids.count()
    cols = [f"mh{i}" for i in range(32)]

    timed(
        "minhash32 SQL fold",
        with_minhash_signature(sids, perms).select("doc_id", *cols),
    )
    timed(
        "minhash32 arrow exact",
        arrowfold.minhash_signature_arrow(sids, perms).select(
            "doc_id", *cols
        ),
    )

    # pair-cosine fold shape: ~40k pairs of 64-dim vectors
    v = emb.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    a = v.select(F.col("vid").alias("a_id"), F.col("vec").alias("a_vec"))
    b = v.select(F.col("vid").alias("b_id"), F.col("vec").alias("b_vec"))
    pairs = a.join(b, F.col("a_id") % 97 == F.col("b_id") % 97).persist()
    pairs.count()
    timed(
        "pair dot SQL fold",
        pairs.withColumn("d", F.expr(sp_dot("a_vec", "b_vec"))).select(
            "a_id", "b_id", "d"
        ),
    )
    timed(
        "pair dot arrow exact",
        pairs.withColumn(
            "d", arrowfold.exact_fold_dot("a_vec", "b_vec")
        ).select("a_id", "b_id", "d"),
    )

    dim = int(emb.select(F.size("embedding")).first()[0])
    timed(
        "hyperplane bands SQL (8x4)",
        hyperplane_band_struct(
            emb, "vec_id", "embedding", 8, 4, dim, engine="sql"
        ),
    )
    from nfl_data_pipeline_spark.operators.similarity import _prep

    udf = arrowfold.exact_band_vals_udf(spark, 8, 4, dim)
    timed(
        "hyperplane bands arrow exact (8x4)",
        _prep(emb, "vec_id", "embedding", "c", dim).withColumn(
            "_hbs", udf(F.col("c_vec"))
        ),
    )


if __name__ == "__main__":
    main()
