"""Bit-identity check for the exact-order Arrow fold kernels
(operators/arrowfold.py) against the interpreted SQL folds they
replace, over the REAL fixture corpora plus adversarial edges
(NULLs, empties, ragged lengths).

Every comparison is exact (== on the collected values, no tolerance):
the kernels' contract is bit-identity, not closeness. Prints one
PASS/FAIL line per kernel and exits nonzero on any FAIL.
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


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

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    spark = get_spark(app_name="arrowfold-equiv")
    spark.sparkContext.setLogLevel("ERROR")
    fails = 0

    def check(name: str, ok: bool, detail: str = "") -> None:
        nonlocal fails
        print(f"{'PASS' if ok else 'FAIL'} {name} {detail}")
        if not ok:
            fails += 1

    docs = load(spark, sf_dir, "documents")
    emb = load(spark, sf_dir, "embeddings")

    # ---- 1. 32-perm MinHash signature ------------------------------
    perms = gate_minhash_perms(32)
    sids = _materialized_sids(docs, "text", 3)
    # adversarial rows: empty sids, NULL sids
    edge = spark.createDataFrame(
        [(10**9, []), (10**9 + 1, None)],
        "doc_id long, sids array<bigint>",
    )
    base = sids.select("doc_id", "sids").unionByName(edge)
    cols = [f"mh{i}" for i in range(32)]
    sql_rows = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in with_minhash_signature(base, perms)
        .select("doc_id", *cols)
        .collect()
    }
    arrow_rows = {
        r["doc_id"]: tuple(r[c] for c in cols)
        for r in arrowfold.minhash_signature_arrow(base, perms)
        .select("doc_id", *cols)
        .collect()
    }
    check(
        "minhash_signature_arrow",
        sql_rows == arrow_rows,
        f"({len(sql_rows)} docs incl. empty/NULL edges)",
    )

    # ---- 1b. text -> sids kernel vs with_shingle_ids ----------------
    from nfl_data_pipeline_spark.operators.dedup import with_shingle_ids

    edge_txt = spark.createDataFrame(
        [
            (3 * 10**9 + 0, None),
            (3 * 10**9 + 1, ""),
            (3 * 10**9 + 2, "one two"),
            (3 * 10**9 + 3, "a  b  c  d "),
            (3 * 10**9 + 4, "héllo wörld ünïcode test é́ x"),
            (3 * 10**9 + 5, "dup dup dup dup dup"),
            (3 * 10**9 + 6, " leading and trailing "),
        ],
        "doc_id long, text string",
    )
    tbase = docs.select("doc_id", "text").unionByName(edge_txt)
    for n in (2, 3, 5):
        sql_sids = {
            r["doc_id"]: list(r["sids"])
            for r in with_shingle_ids(tbase, "text", n)
            .select("doc_id", "sids")
            .collect()
        }
        arr_sids = {
            r["doc_id"]: list(r["sids"])
            for r in tbase.withColumn(
                "sids", arrowfold.shingle_sids_udf(n)(F.col("text"))
            )
            .select("doc_id", "sids")
            .collect()
        }
        check(
            f"shingle_sids_udf(n={n})",
            sql_sids == arr_sids,
            f"({len(sql_sids)} docs, order-compared)",
        )

    # ---- 2. exact_fold_dot vs sp_dot (lambda fold) ------------------
    v = emb.select(
        F.col("vec_id").alias("vid"),
        F.col("embedding").cast("array<double>").alias("vec"),
    )
    a = v.select(F.col("vid").alias("a_id"), F.col("vec").alias("a_vec"))
    b = v.select(F.col("vid").alias("b_id"), F.col("vec").alias("b_vec"))
    pairs = a.join(b, F.col("a_id") % 97 == F.col("b_id") % 97)
    # adversarial: NULL vec, ragged lengths, empty
    edge_p = spark.createDataFrame(
        [
            (1, 2, None, [1.0, 2.0]),
            (3, 4, [1.0], [1.0, 2.0]),
            (5, 6, [], []),
            (7, 8, [0.1] * 64, [0.2] * 64),
        ],
        "a_id long, b_id long, a_vec array<double>, b_vec array<double>",
    )
    pairs = pairs.unionByName(edge_p)
    sql_d = {
        (r["a_id"], r["b_id"]): r["d"]
        for r in pairs.withColumn(
            "d", F.expr(sp_dot("a_vec", "b_vec"))
        )
        .select("a_id", "b_id", "d")
        .collect()
    }
    arr_d = {
        (r["a_id"], r["b_id"]): r["d"]
        for r in pairs.withColumn(
            "d", arrowfold.exact_fold_dot("a_vec", "b_vec")
        )
        .select("a_id", "b_id", "d")
        .collect()
    }
    same = set(sql_d) == set(arr_d) and all(
        (sql_d[k] is None and arr_d[k] is None)
        or (
            sql_d[k] is not None
            and arr_d[k] is not None
            and sql_d[k].hex() == arr_d[k].hex()
        )
        for k in sql_d
    )
    check("exact_fold_dot", same, f"({len(sql_d)} pairs, hex-compared)")

    # ---- 4. exact band values vs SQL hyperplane projections ---------
    dim_row = emb.select(F.size("embedding")).first()
    dim = int(dim_row[0])
    emb_edges = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            [
                (2 * 10**9, None),
                (2 * 10**9 + 1, [0.5] * (dim - 1)),
            ],
            f"vec_id long, embedding array<double>",
        )
    )
    sql_b = {
        r["c_id"]: list(r["_hbs"])
        for r in hyperplane_band_struct(
            emb_edges, "vec_id", "embedding", 8, 4, dim, engine="sql"
        )
        .select("c_id", "_hbs")
        .collect()
    }
    udf = arrowfold.exact_band_vals_udf(spark, 8, 4, dim)
    from nfl_data_pipeline_spark.operators.similarity import _prep

    c = _prep(emb_edges, "vec_id", "embedding", "c", dim)
    arr_b = {
        r["c_id"]: list(r["_hbs"])
        for r in c.withColumn("_hbs", udf(F.col("c_vec")))
        .select("c_id", "_hbs")
        .collect()
    }
    check(
        "exact_band_vals_udf",
        sql_b == arr_b,
        f"({len(sql_b)} vectors incl. NULL/short edges)",
    )

    # ---- 5. grouped pair scorer vs the band self-join form ----------
    from nfl_data_pipeline_spark.operators.similarity import (
        _grouped_pair_scores,
        hyperplane_band_rows,
    )

    emb_edges2 = emb.select("vec_id", "embedding").unionByName(
        spark.createDataFrame(
            [
                (4 * 10**9, None),
                (4 * 10**9 + 1, [0.5] * (dim - 1)),   # shorter: NULL cos
                (4 * 10**9 + 2, [0.5] * (dim + 3)),   # longer: prefix dot
                (4 * 10**9 + 3, [0.0] * dim),          # zero vector: inf/NaN
            ],
            "vec_id long, embedding array<double>",
        )
    )
    bands = hyperplane_band_rows(
        emb_edges2, "vec_id", "embedding", 4, 2, dim, engine="sql"
    )
    cos_join = (
        bands.select(
            F.col("c_id").alias("a_id"),
            F.col("c_vec").alias("a_vec"),
            F.col("c_norm").alias("a_norm"),
            "band_id",
            "band_val",
        )
        .join(
            bands.select(
                F.col("c_id").alias("b_id"),
                F.col("c_vec").alias("b_vec"),
                F.col("c_norm").alias("b_norm"),
                "band_id",
                "band_val",
            ),
            ["band_id", "band_val"],
        )
        .filter(F.col("a_id") < F.col("b_id"))
        .withColumn(
            "cosine",
            F.expr(sp_dot("a_vec", "b_vec", dim))
            / (F.col("a_norm") * F.col("b_norm")),
        )
        .select("a_id", "b_id", "cosine")
    )
    jm = {}
    for r in cos_join.collect():
        jm[(r["a_id"], r["b_id"])] = r["cosine"]
    km = {}
    for r in _grouped_pair_scores(
        bands.select("band_id", "band_val", "c_id", "c_vec", "c_norm"),
        ["band_id", "band_val"],
        dim,
    ).collect():
        km[(r["a_id"], r["b_id"])] = r["cosine"]
    # join form keeps NULL-cosine pairs that every caller then drops
    # at the threshold filter; the kernel never emits them
    jm_nonnull = {k: v for k, v in jm.items() if v is not None}
    same = set(jm_nonnull) == set(km) and all(
        (
            jm_nonnull[k].hex() == km[k].hex()
            if not math.isnan(jm_nonnull[k])
            else math.isnan(km[k])
        )
        for k in jm_nonnull
    )
    check(
        "_grouped_pair_scores",
        same,
        f"({len(jm_nonnull)} pairs incl. zero/short/long edges, hex)",
    )

    print("FAILURES:", fails)
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
