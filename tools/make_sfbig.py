"""Materialize a larger scale tier by replicating the sf0.1 fixtures.

The sandbox ships sf0.001/0.01/0.1 only (TESTDATA.md); the scale
study in SCALING.md §"sf1 tier" needs a ~10x tier to see multi-file
scans, real shuffle spill pressure, and partition-count sensitivity.
This tool builds one: each fact table is unioned MULT times with a
per-replica key offset so surrogate keys stay unique and key
cardinality scales with the data (10x rows AND 10x customers/orders/
parts — a true scale-up, not 10x rows per key).

Replication model per table:

- region/nation: fixed dimensions, copied as-is (like TPC-H).
- customer/supplier/part/orders/lineitem: every *key column* gets
  ``replica * KEY_OFFSET`` added, preserving referential integrity
  within a replica and disjoint key ranges across replicas.
- events: event_id/user_id offset; ``ts`` is kept — a 10x corpus is a
  10x event *rate*, so windows get denser, which is the realistic
  load for the window/streaming queries.
- documents: doc_id offset. Replica text keeps exact copies on odd
  doc_ids and appends a replica-tag token on even ones, so the tier
  contains both exact and near duplicates at a *constant* group size
  (<= 2*MULT). Dedup output grows linearly with the corpus — the
  honest scale-up model; a quadratic duplicate blow-up would be a
  property of the synthetic data, not the engine.
- embeddings: vec_id offset, vectors copied (duplicate vectors
  cluster together; group size bounded by MULT).

Output layout intentionally differs from the fixtures' single
one-row-group file: each table is written through a round-robin
repartition sized at ~64 MB/file so cold scans parallelize like a
real warehouse table.

Usage:
    python tools/make_sfbig.py [--mult 10] [--src /root/testdata/sf0.1]
                               [--out /tmp/sfbig]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import DataFrame, functions as F

from nfl_data_pipeline_spark.session import get_spark

# Larger than any key in the source tier (max l_orderkey at sf0.1 is
# ~600k); replicas occupy disjoint [i*OFF, (i+1)*OFF) ranges.
KEY_OFFSET = 10_000_000

# key columns to shift, per table (referential pairs share the offset)
SHIFT = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

COPY_AS_IS = ("region", "nation")


def replicate(df: DataFrame, table: str, mult: int) -> DataFrame:
    """Union MULT key-shifted copies of ``df`` (one narrow map each —
    no shuffle; the union is a plan-level concat of scans)."""
    parts = []
    for i in range(mult):
        rep = df
        for k in SHIFT.get(table, []):
            rep = rep.withColumn(k, (F.col(k) + F.lit(i * KEY_OFFSET)).cast("long"))
        if table == "documents" and i > 0:
            # even ids: near-dup (tag token appended); odd ids: exact dup
            rep = rep.withColumn(
                "text",
                F.when(
                    F.col("doc_id") % 2 == 0,
                    F.concat(F.col("text"), F.lit(f" replicatag{i}")),
                ).otherwise(F.col("text")),
            ).withColumn("n_chars", F.length("text").cast("long"))
        parts.append(rep)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="/tmp/sfbig")
    args = ap.parse_args()

    spark = get_spark(app_name="make_sfbig")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    os.makedirs(args.out, exist_ok=True)
    for table in COPY_AS_IS + tuple(SHIFT):
        src = os.path.join(args.src, f"{table}.parquet")
        if not os.path.exists(src):
            continue
        df = spark.read.parquet(src)
        big = replicate(df, table, args.mult) if table in SHIFT else df
        # ~64 MB parquet files: size file count from the source file's
        # bytes (replicated data compresses the same).
        src_bytes = sum(
            os.path.getsize(os.path.join(r, f))
            for r, _, fs in os.walk(src)
            for f in fs
        ) if os.path.isdir(src) else os.path.getsize(src)
        n_files = max(1, (src_bytes * args.mult) // (64 * 1024 * 1024))
        dst = os.path.join(args.out, f"{table}.parquet")
        big.repartition(int(n_files)).write.mode("overwrite").parquet(dst)
        n = spark.read.parquet(dst).count()
        print(f"{table}: {n} rows -> {dst} ({n_files} files)", flush=True)
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
