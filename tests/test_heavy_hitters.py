"""Two-pass exact heavy hitters: the Misra-Gries candidate set must
be a SUPERSET of the true heavy keys under any partitioning, and the
final answer must equal the exact group-by regardless of layout."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.sketches import (
    heavy_hitters,
    misra_gries_sketches,
)


def _stream(spark, n_parts):
    """Zipf-ish key stream: a few hot keys + a long uniform tail,
    shuffled deterministically."""
    rng = random.Random(11)
    keys = (
        ["hot_a"] * 600
        + ["hot_b"] * 300
        + ["warm_c"] * 80
        + [f"tail_{rng.randrange(5000)}" for _ in range(9020)]
    )
    rng.shuffle(keys)
    return spark.createDataFrame(
        [(k,) for k in keys], "k string"
    ).repartition(n_parts)


def _exact(df, phi_inv):
    n = df.count()
    return {
        (r["k"], r["n"])
        for r in df.groupBy("k")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") * phi_inv >= n)
        .collect()
    }


def test_matches_exact_groupby_across_partitionings(spark):
    for n_parts, phi_inv in [(1, 100), (4, 100), (13, 100), (4, 20)]:
        df = _stream(spark, n_parts)
        got = {
            (r["k"], r["n"])
            for r in heavy_hitters(df, "k", phi_inv=phi_inv).collect()
        }
        assert got == _exact(df, phi_inv), (n_parts, phi_inv)
        assert ("hot_a", 600) in got


def test_candidate_superset_even_at_tight_capacity(spark):
    """capacity = phi_inv is the guarantee's edge: every truly heavy
    key must appear in the sketch union even when the tail churns the
    counters hard."""
    df = _stream(spark, 8)
    phi_inv = 20  # heavy ⟺ count ≥ 500 → only hot_a
    sk = misra_gries_sketches(df, "k", capacity=phi_inv)
    cands = {r["key"] for r in sk.filter(F.col("key").isNotNull()).collect()}
    assert "hot_a" in cands
    # one pass also carries N
    n = (
        sk.filter(F.col("key").isNull())
        .agg(F.sum("mg_count"))
        .first()[0]
    )
    assert n == df.count()


def test_non_string_key_column(spark):
    """bigint keys must work end-to-end: the sketch casts to string
    at the Arrow boundary and the semi join compares on a cast, but
    the answer keeps the original key type."""
    rng = random.Random(3)
    vals = [7] * 500 + [rng.randrange(10_000) for _ in range(2000)]
    rng.shuffle(vals)
    df = spark.createDataFrame(
        [(v,) for v in vals], "id bigint"
    ).repartition(6)
    got = {
        (r["id"], r["n"])
        for r in heavy_hitters(df, "id", phi_inv=10).collect()
    }
    n = len(vals)
    want = {
        (r["id"], r["n"])
        for r in df.groupBy("id")
        .agg(F.count("*").cast("bigint").alias("n"))
        .filter(F.col("n") * 10 >= n)
        .collect()
    }
    assert got == want and (7, 500) in got
    # and the key column kept its type
    hh = heavy_hitters(df, "id", phi_inv=10)
    assert dict(hh.dtypes)["id"] == "bigint"


def test_key_col_named_key(spark):
    """key_col == 'key' must not collide with the sketch's internal
    column name in the broadcast-semi join condition."""
    rng = random.Random(4)
    keys = ["hot"] * 300 + [f"t{rng.randrange(500)}" for _ in range(1200)]
    rng.shuffle(keys)
    df = spark.createDataFrame(
        [(k,) for k in keys], "key string"
    ).repartition(5)
    got = {
        (r["key"], r["n"])
        for r in heavy_hitters(df, "key", phi_inv=10).collect()
    }
    assert ("hot", 300) in got
    assert got == _exact(df.withColumnRenamed("key", "k"), 10)


def test_empty_and_tiny_streams(spark):
    empty = spark.createDataFrame([], "k string")
    assert heavy_hitters(empty, "k", phi_inv=100).count() == 0
    one = spark.createDataFrame([("x",)], "k string")
    assert [tuple(r) for r in heavy_hitters(one, "k").collect()] == [
        ("x", 1)
    ]
