"""Incremental weighted reservoir (streaming/sample.py): stream ==
one-shot, deterministic keys, replay/dedup/mismatch guards."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.operators.sampling import hamilton_quotas
from nfl_data_pipeline_spark.streaming.sample import (
    read_reservoir,
    read_stratified_reservoir,
    reservoir_key,
    update_reservoir,
    update_stratified_reservoir,
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


def test_reservoir_weight_drift_resolves_deterministically(
    spark, tmp_path
):
    # the same doc re-offered with a CHANGED weight must resolve to
    # ONE deterministic row (max (skey, weight) — the most favorable
    # draw), in any batching order
    lo = spark.createDataFrame([(1, 10), (2, 20)], "doc_id long, weight long")
    hi = spark.createDataFrame([(1, 500), (3, 7)], "doc_id long, weight long")
    t_a = TxTable(str(tmp_path / "a"))
    t_b = TxTable(str(tmp_path / "b"))
    update_reservoir(spark, lo, t_a, k=10, seed=3, batch_id="b0")
    update_reservoir(spark, hi, t_a, k=10, seed=3, batch_id="b1")
    update_reservoir(spark, hi, t_b, k=10, seed=3, batch_id="b0")
    update_reservoir(spark, lo, t_b, k=10, seed=3, batch_id="b1")
    a = sorted(tuple(r) for r in read_reservoir(spark, t_a).collect())
    b = sorted(tuple(r) for r in read_reservoir(spark, t_b).collect())
    assert a == b
    got = {r[0]: r[1] for r in a}
    # doc 1 resolved to the larger weight (larger E-S key), once
    assert got[1] == 500
    assert sorted(got) == [1, 2, 3]


def test_reservoir_stamp_mismatch_raises_even_on_replay(spark, tmp_path):
    docs = _docs(spark, n=60)
    t = TxTable(str(tmp_path / "res"))
    assert update_reservoir(spark, docs, t, k=10, seed=2, batch_id="b0")
    # replaying b0 with a WRONG k must fail fast, not silently
    # return False (the stamp check runs before the replay return)
    with pytest.raises(ValueError, match="res_k"):
        update_reservoir(spark, docs, t, k=11, seed=2, batch_id="b0")


def _strat_docs(spark, n=600):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.element_at(
            F.array(F.lit("web"), F.lit("code"), F.lit("wiki")),
            (F.col("id") % 3 + 1).cast("int"),
        ).alias("stratum"),
        ((F.col("id") * 13) % 89 + 1).cast("long").alias("weight"),
    )


QW = {"web": 70, "code": 20, "wiki": 10}


def test_stratified_reservoir_stream_equals_oneshot(spark, tmp_path):
    docs = _strat_docs(spark)
    t = TxTable(str(tmp_path / "sres"))
    for i in range(3):
        assert update_stratified_reservoir(
            spark, docs.filter(F.col("doc_id") % 3 == i), t,
            k=50, seed=11, quota_weights=QW, batch_id=f"b{i}",
        )
    got = sorted(
        tuple(r) for r in read_stratified_reservoir(spark, t).collect()
    )
    quotas = hamilton_quotas(QW, 50)
    assert sum(quotas.values()) == 50
    # per-stratum counts match the Hamilton split exactly
    from collections import Counter

    counts = Counter(r[1] for r in got)
    assert dict(counts) == {s: q for s, q in quotas.items() if q > 0}
    # one-shot per-stratum top-k_s over everything offered
    keyed = docs.select(
        "doc_id", "stratum", "weight",
        reservoir_key("doc_id", "weight", 11).alias("skey"),
    )
    oneshot = []
    for s, q in quotas.items():
        oneshot.extend(
            tuple(r)
            for r in keyed.filter(F.col("stratum") == s)
            .orderBy(F.col("skey").desc(), "doc_id")
            .limit(q)
            .collect()
        )
    assert got == sorted(oneshot)


def test_stratified_reservoir_replay_and_pinned_quotas(spark, tmp_path):
    docs = _strat_docs(spark, n=200)
    t = TxTable(str(tmp_path / "sres"))
    assert update_stratified_reservoir(
        spark, docs, t, k=20, seed=4, quota_weights=QW, batch_id="b0"
    )
    before = sorted(
        tuple(r) for r in read_stratified_reservoir(spark, t).collect()
    )
    # replay: no-op
    assert not update_stratified_reservoir(
        spark, docs, t, k=20, seed=4, quota_weights=QW, batch_id="b0"
    )
    # re-offer under a new batch id: fixed point
    assert update_stratified_reservoir(
        spark, docs, t, k=20, seed=4, quota_weights=QW, batch_id="b1"
    )
    after = sorted(
        tuple(r) for r in read_stratified_reservoir(spark, t).collect()
    )
    assert after == before
    # the quota SPLIT is the pinned property: a different mix raises
    with pytest.raises(ValueError, match="res_quotas"):
        update_stratified_reservoir(
            spark, docs, t, k=20, seed=4,
            quota_weights={"web": 10, "code": 80, "wiki": 10},
            batch_id="b2",
        )
    # ... but weight dicts with the SAME Hamilton split are accepted
    assert update_stratified_reservoir(
        spark, docs, t, k=20, seed=4,
        quota_weights={"web": 700, "code": 200, "wiki": 100},
        batch_id="b3",
    )
    # strata outside the pinned map are never sampled
    alien = spark.createDataFrame(
        [(9001, "books", 10_000_000)], "doc_id long, stratum string, weight long"
    )
    assert update_stratified_reservoir(
        spark, alien, t, k=20, seed=4, quota_weights=QW, batch_id="b4"
    )
    final = read_stratified_reservoir(spark, t)
    assert final.filter(F.col("stratum") == "books").count() == 0


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
