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
- documents: doc_id offset, and replica text is REWRITTEN, not
  copied: replica i of doc d splices the first half of d's words with
  the second half of another doc's (a deterministic stride), so each
  replica has a distinct shingle set. A 10% sample of each replica
  stays an exact copy — the planted duplicate rate. Verbatim 10x
  copies of every doc would multiply every shingle's document
  frequency by MULT and candidate-pair counts by MULT² (measured:
  early sfbig builds sent the n-gram dedup family superlinear purely
  from data shape); real corpora grow mostly-unique content with a
  bounded duplicate fraction, which is what dedup cost models assume.
- embeddings: vec_id offset; replica vectors are rotated
  (coordinate roll by i) + sign-flipped on one coordinate — distinct
  directions, same distribution; 10% stay exact duplicates.

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


def _respin_documents(df: DataFrame, i: int) -> DataFrame:
    """Replica i's text: splice the doc's first half with the second
    half of a stride-partner doc (distinct shingle sets), except a 10%
    exact-copy sample (``doc_id % 10 == i % 10``) — the planted
    duplicate rate."""
    n = df.count()
    stride = 997 * i  # odd stride, coprime-ish with the id space
    partner = df.select(
        ((F.col("doc_id") + F.lit(stride)) % F.lit(n)).alias("doc_id"),
        F.col("text").alias("ptext"),
    )
    j = df.join(partner, "doc_id")
    w = F.split(F.col("text"), " ")
    pw = F.split(F.col("ptext"), " ")
    half = (F.size(w) / 2).cast("int")
    phalf = (F.size(pw) / 2).cast("int")
    spliced = F.concat_ws(
        " ",
        F.concat(
            F.slice(w, F.lit(1), half),
            F.slice(pw, phalf + 1, F.size(pw) - phalf),
        ),
    )
    return (
        j.withColumn(
            "text",
            F.when(F.col("doc_id") % 10 == i % 10, F.col("text")).otherwise(
                spliced
            ),
        )
        .withColumn("n_chars", F.length("text").cast("long"))
        .drop("ptext")
    )


def _respin_embeddings(df: DataFrame, i: int) -> DataFrame:
    """Replica i's vector: roll coordinates by i and flip one sign —
    a distinct direction with the same norm/distribution; 10% stay
    exact duplicates."""
    dim = F.size("embedding")
    rolled = F.transform(
        F.col("embedding"),
        lambda _x, j: F.element_at(
            F.col("embedding"), ((j + F.lit(i)) % dim) + 1
        )
        * F.when((j + F.lit(i)) % dim == 0, F.lit(-1.0)).otherwise(F.lit(1.0)),
    )
    return df.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 10 == i % 10, F.col("embedding")).otherwise(
            rolled
        ),
    )


def replicate(df: DataFrame, table: str, mult: int) -> DataFrame:
    """Union MULT key-shifted copies of ``df`` (one narrow map each —
    no shuffle beyond the documents partner join; the union is a
    plan-level concat of scans)."""
    parts = []
    for i in range(mult):
        rep = df
        if table == "documents" and i > 0:
            rep = _respin_documents(rep, i)
        if table == "embeddings" and i > 0:
            rep = _respin_embeddings(rep, i)
        for k in SHIFT.get(table, []):
            rep = rep.withColumn(k, (F.col(k) + F.lit(i * KEY_OFFSET)).cast("long"))
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
