"""A/B the near-dup gate's exact-verify representation (r11 VERDICT
next #5).

The r11 action-level attribution priced the incremental gate's exact
Jaccard verify at ~4 s/batch (sf0.1) and the verdict prescribed
"verify over xxhash64-hashed shingle arrays instead of strings". The
shipped gate ALREADY verifies over hashed 8-byte shingle ids — every
sids array is Horner-composed token hashes (operators/hashing.py
sp_token_hashes → sp_shingle_ids, BIGINT elements), adopted in r1
precisely because per-character string work dominates. This tool
makes that concrete with a controlled A/B at a chosen tier, over the
SAME candidate pair set:

  A  string-shingle arrays  (the verdict's premise: array<string>
     n-gram shingles, array_intersect over strings)
  B  hashed-id arrays       (shipped: array<bigint>)
  C  B + size prefilter     (drop pairs where min(|a|,|b|) <
     threshold * max(|a|,|b|) BEFORE shipping arrays — the classic
     length filter from similarity joins)

and reports per-variant verify wall (min of N runs), edge counts,
and the A-vs-B edge-set delta (hash-collision precision effect).

Usage:
    python tools/verify_repr_ab.py [sf_dir] [threshold] [runs]
    # defaults: /tmp/sfbig (10x tier; rebuild with tools/make_sfbig.py)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from nfl_data_pipeline_spark.catalog import load  # noqa: E402
from nfl_data_pipeline_spark.operators.dedup import (  # noqa: E402
    _materialized_sids,
)
from nfl_data_pipeline_spark.operators.hashing import (  # noqa: E402
    sp_shingles,
)
from nfl_data_pipeline_spark.session import get_spark  # noqa: E402
from nfl_data_pipeline_spark.streaming.neardup import (  # noqa: E402
    GATE_PERMS,
    _band_rows,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 0.5
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    spark = get_spark(app_name="verify-repr-ab")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load(spark, sf_dir, "documents")
    from nfl_data_pipeline_spark.operators.dedup import (
        with_minhash_signature,
    )

    # Candidate generation exactly as the gate does it (batch half vs
    # registry half, band join) — checkpointed so every variant
    # verifies the SAME pair set and timing isolates the verify.
    sids_h = _materialized_sids(docs, "text", 3)
    sig = with_minhash_signature(sids_h, GATE_PERMS).select(
        "doc_id", *[f"mh{i}" for i in range(len(GATE_PERMS))]
    )
    bands = _band_rows(sig).select("doc_id", "band_id", "h_lo", "h_hi")
    a = bands.filter(F.col("doc_id") % 2 == 0)
    b = bands.filter(F.col("doc_id") % 2 == 1)
    cands = (
        a.alias("a")
        .join(b.alias("b"), ["band_id", "h_lo", "h_hi"])
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
        .localCheckpoint(eager=True)
    )
    n_cands = cands.count()

    # Verify-side tables, both materialized up front (registration
    # cost is paid ONCE per registered doc in the real gate; the
    # per-batch cost being A/B'd here is the verify join).
    side_h = sids_h.select("doc_id", "sids").localCheckpoint(eager=True)
    side_s = (
        docs.select(
            "doc_id", F.split(F.col("text"), " ").alias("tokens")
        )
        .select(
            "doc_id",
            F.array_distinct(F.expr(sp_shingles("tokens", 3))).alias(
                "sids"
            ),
        )
        .localCheckpoint(eager=True)
    )

    jac = F.size(F.array_intersect("a_sids", "b_sids")) / F.size(
        F.array_union("a_sids", "b_sids")
    )

    def verify_plain(side):
        return (
            cands.join(
                side.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("sids").alias("a_sids"),
                ),
                "doc_a",
            )
            .join(
                side.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("sids").alias("b_sids"),
                ),
                "doc_b",
            )
            .filter(jac >= threshold)
            .select("doc_a", "doc_b")
        )

    def verify_prefilter(side):
        sizes = side.select(
            "doc_id", F.size("sids").alias("ns")
        )
        kept = (
            cands.join(
                sizes.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("ns").alias("na"),
                ),
                "doc_a",
            )
            .join(
                sizes.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("ns").alias("nb"),
                ),
                "doc_b",
            )
            .filter(
                F.least("na", "nb")
                >= F.lit(threshold) * F.greatest("na", "nb")
            )
            .select("doc_a", "doc_b")
        )
        return (
            kept.join(
                side.select(
                    F.col("doc_id").alias("doc_a"),
                    F.col("sids").alias("a_sids"),
                ),
                "doc_a",
            )
            .join(
                side.select(
                    F.col("doc_id").alias("doc_b"),
                    F.col("sids").alias("b_sids"),
                ),
                "doc_b",
            )
            .filter(jac >= threshold)
            .select("doc_a", "doc_b")
        )

    variants = {
        "A_string": lambda: verify_plain(side_s),
        "B_hashed (shipped)": lambda: verify_plain(side_h),
        "C_hashed+sizefilter": lambda: verify_prefilter(side_h),
    }
    results = {}
    for name, fn in variants.items():
        walls, n_edges = [], None
        for _ in range(runs):
            t0 = time.perf_counter()
            n_edges = fn().count()
            walls.append(time.perf_counter() - t0)
        results[name] = (min(walls), n_edges)
        print(
            f"{name}: verify={min(walls):.2f}s (runs {['%.2f' % w for w in walls]}) "
            f"edges={n_edges}"
        )

    # collision-precision check: edge sets A vs B
    ea = {tuple(r) for r in variants["A_string"]().collect()}
    eb = {tuple(r) for r in variants["B_hashed (shipped)"]().collect()}
    print(
        f"candidates={n_cands}  edges A-only={len(ea - eb)} "
        f"B-only={len(eb - ea)} common={len(ea & eb)}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
