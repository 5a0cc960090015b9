"""Profiler histogram dial (queries/extra.profile_histograms +
streaming/profilehist.py): stream-merge == one-shot equality, replay
idempotence, quantile-recovery accuracy vs true percentiles, and the
bounded-state property. The oracle hash equality of the batch query
is covered by tests/test_oracle_queries.py's registry sweep."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.queries.extra import (
    _HIST_COLS,
    profile_histograms,
)
from nfl_data_pipeline_spark.streaming.profilehist import (
    ProfileHistState,
    process_profile_batch,
    profile_maintenance_stream,
    read_histograms,
    read_quantiles,
)
from tests.conftest import SF_SMOKE


def _hist_map(df):
    return {(r["col"], r["bucket"]): r["n"] for r in df.collect()}


def _q_rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_stream_merge_equals_one_shot(spark, tmp_path):
    """Three doc_id-split batches merged into state == the one-shot
    histogram over the whole table, bucket-for-bucket — and therefore
    the recovered quantiles are IDENTICAL (the mergeability property
    percentile_approx lacks)."""
    li = load(spark, SF_SMOKE, "lineitem")
    state = ProfileHistState(str(tmp_path / "state"))
    for i, (lo, hi) in enumerate([(0, 2000), (2000, 4000), (4000, 10**12)]):
        b = li.filter(
            (F.col("l_orderkey") >= lo) & (F.col("l_orderkey") < hi)
        )
        process_profile_batch(spark, b, _HIST_COLS, state, f"b{i}")
    want = _hist_map(profile_histograms(li, _HIST_COLS))
    got = _hist_map(read_histograms(spark, state))
    assert got == want
    from nfl_data_pipeline_spark.operators.sketches import (
        histogram_quantiles,
    )

    one_shot = histogram_quantiles(
        profile_histograms(li, _HIST_COLS), ["col"], (0.25, 0.5, 0.75, 0.95)
    )
    assert _q_rows(read_quantiles(spark, state)) == _q_rows(one_shot)


def test_replay_is_noop(spark, tmp_path):
    li = load(spark, SF_SMOKE, "lineitem")
    state = ProfileHistState(str(tmp_path / "state"))
    assert process_profile_batch(spark, li, _HIST_COLS, state, "b0")
    want = _hist_map(read_histograms(spark, state))
    assert process_profile_batch(spark, li, _HIST_COLS, state, "b0") is False
    assert _hist_map(read_histograms(spark, state)) == want


def test_quantile_recovery_within_bucket_width(spark):
    """The accuracy contract: recovered quantile within half a bucket
    width of the TRUE percentile — relative error <= (0.5/9.5)·100%
    ≈ 5.3% for values >= 10, exact for values < 10 (singleton
    buckets)."""
    li = load(spark, SF_SMOKE, "lineitem")
    from nfl_data_pipeline_spark.operators.sketches import (
        histogram_quantiles,
    )

    probs = (0.25, 0.5, 0.75, 0.95)
    rec = {
        r["col"]: [r[f"p{round(p * 100)}"] for p in probs]
        for r in histogram_quantiles(
            profile_histograms(li, _HIST_COLS), ["col"], probs
        ).collect()
    }
    for c in _HIST_COLS:
        true = (
            li.select(
                F.expr(
                    f"percentile(CAST(FLOOR({c}) AS BIGINT),"
                    f" array{probs})"
                ).alias("p")
            ).collect()[0]["p"]
        )
        for got, want in zip(rec[c], true):
            if want < 10:
                assert got == pytest.approx(want, abs=0.5)
            else:
                # midpoint of the bucket CONTAINING the true
                # percentile: mantissa width 1 of [10, 100) → half
                # width / low edge = 0.5/10, plus discrete-percentile
                # interpolation slack
                assert abs(got - want) / want <= 0.06


def test_state_is_bounded_and_stream_wired(spark, tmp_path):
    """State cardinality is O(cols × buckets), independent of row
    count; the foreachBatch wiring lands the same state as the direct
    call."""
    li = load(spark, SF_SMOKE, "lineitem")
    src = str(tmp_path / "src")
    li.coalesce(2).write.parquet(src)
    schema = spark.read.parquet(src).schema
    state = ProfileHistState(str(tmp_path / "state"))
    q = profile_maintenance_stream(
        spark,
        spark.readStream.schema(schema).parquet(src),
        _HIST_COLS,
        state,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(120)
    got = _hist_map(read_histograms(spark, state))
    assert got == _hist_map(profile_histograms(li, _HIST_COLS))
    # 5 columns × (~90 buckets/decade × ≤7 decades + 10 singletons)
    assert len(got) < 5 * (90 * 7 + 10)
