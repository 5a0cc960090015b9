"""Size-gated broadcast hints (operators/hints.py — r9 verdict
finding #2): the dedup/split/sampling label joins must keep the
zero-corpus-shuffle broadcast plan when the label table is small, and
DEGRADE to a shuffle join (not a forced-broadcast abort) when it
grows past the gate — on web-scale corpora duplicated docs are
commonly 30-80% of rows, so 'the label table is tiny' is a regime,
not an invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators import dedup as dd
from nfl_data_pipeline_spark.operators.hints import gated_broadcast


def _labels(spark, n):
    return spark.range(n).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("component")
    )


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_under_gate_broadcasts(spark):
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    joined = docs.join(gated_broadcast(_labels(spark, 50)), "doc_id", "left")
    plan = _plan(joined)
    assert "BroadcastHashJoin" in plan
    # the probe (corpus) side carries no exchange in the broadcast
    # regime — that's the property the gate exists to preserve
    assert "Exchange hashpartitioning(doc_id" not in plan


def test_over_gate_degrades_to_shuffle(spark):
    # a FORCED hint survives autoBroadcastJoinThreshold=-1 (that is
    # exactly why it aborts instead of degrading past 8 GB); an
    # unhinted frame does not. Pin the threshold off to observe the
    # hint's absence above the gate, independent of table-size stats.
    docs = spark.range(500).select(F.col("id").alias("doc_id"))
    labels = _labels(spark, 200)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        over = docs.join(
            gated_broadcast(labels, max_rows=100), "doc_id", "left"
        )
        plan = _plan(over)
        assert "BroadcastHashJoin" not in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # control: under the gate the hint IS forced, so it
        # broadcasts even with the auto threshold off
        under = docs.join(
            gated_broadcast(labels, max_rows=10_000), "doc_id", "left"
        )
        assert "BroadcastHashJoin" in _plan(under)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_gate_preserves_join_results(spark):
    docs = spark.range(200).select(F.col("id").alias("doc_id"))
    labels = _labels(spark, 120)
    lo = docs.join(
        gated_broadcast(labels, max_rows=10), "doc_id", "left"
    )
    hi = docs.join(
        gated_broadcast(labels, max_rows=10_000), "doc_id", "left"
    )
    assert sorted(map(tuple, lo.collect())) == sorted(map(tuple, hi.collect()))


def test_assign_cluster_splits_uses_gate(spark):
    # end-to-end through the operator: small pair graph → the label
    # join must plan as a broadcast with no probe-side exchange
    docs = spark.range(300).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (10, 11)], ["doc_a", "doc_b"]
    )
    out = dd.assign_cluster_splits(docs, pairs)
    plan = _plan(out)
    assert "BroadcastHashJoin" in plan
    n = out.count()
    assert n == 300
    # clustered docs share a split
    rows = {r["doc_id"]: r["split"] for r in out.collect()}
    assert rows[0] == rows[1] == rows[2]
    assert rows[10] == rows[11]


def test_gate_telemetry_records_both_paths(spark, caplog):
    """VERDICT r10 next #5: every gate decision logs (and records in
    the drainable event buffer) its call site, the measured rows and
    the chosen path — on BOTH the broadcast and the shuffle path."""
    import logging

    from nfl_data_pipeline_spark.operators import hints

    hints.drain_gate_events()
    with caplog.at_level(logging.INFO, logger=hints.__name__):
        gated_broadcast(_labels(spark, 50))  # under → broadcast
        gated_broadcast(_labels(spark, 200), max_rows=100)  # over
    msgs = [r.getMessage() for r in caplog.records
            if "gated_broadcast" in r.getMessage()]
    assert any("path=broadcast" in m and "rows=50" in m for m in msgs)
    assert any("path=shuffle" in m and "rows=200" in m for m in msgs)
    evs = hints.drain_gate_events()
    assert [e["path"] for e in evs] == ["broadcast", "shuffle"]
    # the site is THIS test file, not hints.py itself
    assert all(e["site"].startswith("test_broadcast_gate.py:")
               for e in evs)
    assert hints.drain_gate_events() == []  # drained


def test_expected_gate_decisions_at_bench_sf(spark):
    """r11 VERDICT next #6: the bench artifact records where every
    gate crossover landed, but nothing asserted the EXPECTED
    decisions — a silent default-flip (threshold change, a query
    regrowing its gated table) would first surface as a 100-TB abort
    or a quietly shuffled plan. Pin the expected decision per site
    family at the bench SF (sf0.1): the tfidf doc-frequency table and
    the bigram count tables must broadcast; a label table past
    BROADCAST_MAX_ROWS must shuffle."""
    import os

    from nfl_data_pipeline_spark.operators.hints import (
        BROADCAST_MAX_ROWS,
        drain_gate_events,
        gated_broadcast,
    )
    from nfl_data_pipeline_spark.queries.llmprep import bigram_logprob
    from nfl_data_pipeline_spark.queries.textops import tfidf_top_terms

    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    drain_gate_events()

    tfidf_top_terms(spark, sf).count()
    bigram_logprob(spark, sf).count()
    by_file: dict[str, set[str]] = {}
    for ev in drain_gate_events():
        by_file.setdefault(ev["site"].split(":")[0], set()).add(ev["path"])
    # term/vocab-bounded tables: broadcast at every realistic SF
    assert by_file.get("textops.py") == {"broadcast"}, by_file
    assert by_file.get("llmprep.py") == {"broadcast"}, by_file

    # past the gate: degrade to shuffle, never a forced broadcast.
    # spark.range keeps the count metadata-cheap at 4M+1 rows; the
    # assert pins BROADCAST_MAX_ROWS itself — raising the default
    # without revisiting this table breaks here first.
    big = spark.range(BROADCAST_MAX_ROWS + 1).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7).alias("component")
    )
    gated_broadcast(big)
    (ev,) = drain_gate_events()
    assert ev["path"] == "shuffle" and ev["rows"] == BROADCAST_MAX_ROWS + 1
