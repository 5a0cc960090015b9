"""Incremental weighted reservoir (streaming/sample.py): stream ==
one-shot, deterministic keys, replay/dedup/mismatch guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.streaming.sample import (
    read_reservoir,
    reservoir_key,
    update_reservoir,
)


def _docs(spark, n=500, heavy=None):
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        ((F.col("id") * 31) % 97 + 1).cast("long").alias("weight"),
    )
    if heavy is not None:
        df = df.withColumn(
            "weight",
            F.when(F.col("doc_id") == heavy, F.lit(1_000_000)).otherwise(
                F.col("weight")
            ),
        )
    return df


def test_reservoir_stream_equals_oneshot_and_python(spark, tmp_path):
    docs = _docs(spark, heavy=7)
    t = TxTable(str(tmp_path / "res"))
    for i in range(3):
        assert update_reservoir(
            spark, docs.filter(F.col("doc_id") % 3 == i), t,
            k=40, seed=5, batch_id=f"b{i}",
        )
    got = {
        r["doc_id"]: (r["weight"], r["skey"])
        for r in read_reservoir(spark, t).collect()
    }
    assert len(got) == 40
    # one-shot top-k over everything — identical rows AND keys
    oneshot = {
        r["doc_id"]: (r["weight"], r["skey"])
        for r in docs.select(
            "doc_id",
            "weight",
            reservoir_key("doc_id", "weight", 5).alias("skey"),
        )
        .orderBy(F.col("skey").desc(), "doc_id")
        .limit(40)
        .collect()
    }
    assert got == oneshot
    # the million-weight doc is effectively certain to be sampled
    assert 7 in got
    # keys match an independent recompute of ln(u)/w for sampled rows
    rows = docs.select(
        "doc_id", "weight",
        F.xxhash64("doc_id", F.lit(5)).alias("h"),
    ).collect()
    for r in rows:
        if r["doc_id"] in got:
            u = ((r["h"] & ((1 << 63) - 1)) + 1.0) / float((1 << 63) + 1)
            assert got[r["doc_id"]][1] == pytest.approx(
                math.log(u) / r["weight"], rel=1e-12
            )


def test_reservoir_replay_reoffer_and_mismatch(spark, tmp_path):
    docs = _docs(spark, n=120)
    t = TxTable(str(tmp_path / "res"))
    assert update_reservoir(spark, docs, t, k=25, seed=9, batch_id="b0")
    before = sorted(
        tuple(r) for r in read_reservoir(spark, t).collect()
    )
    # replay: no-op
    assert not update_reservoir(spark, docs, t, k=25, seed=9, batch_id="b0")
    # re-offer the same docs under a new batch id: identical keys →
    # identical reservoir, no duplicates
    assert update_reservoir(spark, docs, t, k=25, seed=9, batch_id="b1")
    after = sorted(tuple(r) for r in read_reservoir(spark, t).collect())
    assert after == before
    ids = [r[0] for r in after]
    assert len(ids) == len(set(ids)) == 25
    # k / seed are table properties
    with pytest.raises(ValueError, match="res_k"):
        update_reservoir(spark, docs, t, k=30, seed=9, batch_id="b2")
    with pytest.raises(ValueError, match="res_seed"):
        update_reservoir(spark, docs, t, k=25, seed=10, batch_id="b2")


def test_reservoir_underfull_and_ineligible_rows(spark, tmp_path):
    rows = spark.createDataFrame(
        [(1, 10), (2, None), (None, 5), (3, 0), (4, 3)],
        "doc_id long, weight long",
    )
    t = TxTable(str(tmp_path / "res"))
    update_reservoir(spark, rows, t, k=10, seed=1, batch_id="b0")
    got = {r["doc_id"] for r in read_reservoir(spark, t).collect()}
    # NULL id / NULL weight / zero weight never enter
    assert got == {1, 4}
