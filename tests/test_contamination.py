"""Benchmark-decontamination checks: planted-overlap semantics on a
synthetic corpus, and the broadcast plan shape that keeps the corpus
un-shuffled at 100 TB (the benchmark side is the small side by
contract — eval suites are KBs)."""

from __future__ import annotations

import pytest

from nfl_data_pipeline_spark.queries import all_queries
from tests.conftest import SF_CORRECT


@pytest.fixture(scope="module")
def planted_dir(spark, tmp_path_factory):
    """documents.parquet where src1 doc 100 is an exact copy of a
    src0 (benchmark) doc, doc 101 shares a half-overlapping token
    stream, and doc 102 is disjoint."""
    bench_text = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    half_text = "alpha beta gamma delta epsilon nova orbit pulsar quasar rover"
    clean_text = "one two three four five six seven eight nine ten"
    rows = [
        (0, bench_text, "en", "src0", len(bench_text)),
        (1, "filler words for the benchmark side here ok fine", "en", "src0", 48),
        (100, bench_text, "en", "src1", len(bench_text)),
        (101, half_text, "en", "src1", len(half_text)),
        (102, clean_text, "en", "src2", len(clean_text)),
    ]
    d = tmp_path_factory.mktemp("contamination")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.parquet(str(d / "documents.parquet"))
    return str(d)


def test_planted_overlap_fractions(spark, planted_dir):
    q = all_queries()["benchmark_contamination"].spark
    out = {r["doc_id"]: r.asDict() for r in q(spark, planted_dir).collect()}
    # exact copy: every shingle shared
    assert out[100]["contamination"] == 1.0
    assert out[100]["is_contaminated"] == 1
    # half-overlapping stream: the first 3 of 8 word-3-grams match
    assert 0 < out[101]["contamination"] < 1.0
    # disjoint doc never appears in the report
    assert 102 not in out


def test_benchmark_side_is_broadcast(spark):
    df = all_queries()["benchmark_contamination"].spark(spark, SF_CORRECT)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastExchange" in plan
    # the corpus side must not be exchanged before the probe join: the
    # only hash exchanges are the benchmark side's tiny distinct (on
    # sid, pre-broadcast) and the final doc_id aggregate
    assert plan.count("Exchange hashpartitioning") == 2
