"""Incremental MinHash-LSH near-dup gate (streaming/neardup.py):
single-batch equivalence with the one-shot estimate-and-cluster
computation, cross-batch first-arrival-wins on planted near-dups,
replay idempotence, and registry growth bounded by kept docs."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.operators.dedup import (
    _materialized_sids,
    connected_components,
    with_minhash_signature,
)
from nfl_data_pipeline_spark.streaming.neardup import (
    _SIG,
    GATE_BANDS,
    GATE_PERMS,
    NearDupState,
    _band_rows,
    process_neardup_batch,
)
from tests.conftest import SF_SMOKE

THR = 0.5


def _verdict_map(df):
    return {r["doc_id"]: (r["keep"], r["dup_of"]) for r in df.collect()}


def _oneshot_winners(spark, docs):
    """Batch twin: same banding, same exact verify, components over
    the whole corpus at once; winner = min doc_id per component."""
    sids = _materialized_sids(docs, "text", 3)
    sig = with_minhash_signature(sids, GATE_PERMS).select("doc_id", *_SIG)
    bands = _band_rows(sig).persist()
    cands = (
        bands.alias("a")
        .join(bands.alias("b"), ["band_id", "h_lo", "h_hi"])
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    j = F.size(F.array_intersect("a_sids", "b_sids")) / F.size(
        F.array_union("a_sids", "b_sids")
    )
    pairs = (
        cands.join(
            sids.select(F.col("doc_id").alias("doc_a"), F.col("sids").alias("a_sids")),
            "doc_a",
        )
        .join(
            sids.select(F.col("doc_id").alias("doc_b"), F.col("sids").alias("b_sids")),
            "doc_b",
        )
        .filter(j >= THR)
        .select("doc_a", "doc_b")
    )
    comps = connected_components(pairs)
    winners = comps.groupBy("component").agg(F.min("node").alias("w"))
    dupmap = {
        r["node"]: r["w"]
        for r in comps.join(winners, "component").collect()
    }
    all_ids = [r["doc_id"] for r in sig.select("doc_id").collect()]
    return {d: dupmap.get(d, d) for d in all_ids}


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_SMOKE, "documents")


def test_single_batch_equals_oneshot(spark, tmp_path, docs):
    state = NearDupState(str(tmp_path / "s"))
    got = _verdict_map(process_neardup_batch(spark, docs, state, "b0", THR))
    want = _oneshot_winners(spark, docs)
    assert {d: v[1] for d, v in got.items()} == want
    kept = {d for d, v in got.items() if v[0] == 1}
    assert kept == {d for d, w in want.items() if d == w}
    # registry holds exactly the winners (GATE_BANDS band rows each,
    # one sids row each)
    reg = state.sigs.read(spark)
    assert reg.select("doc_id").distinct().count() == len(kept)
    assert reg.count() == GATE_BANDS * len(kept)
    assert state.sids.read(spark).count() == len(kept)


def test_cross_batch_first_arrival_wins(spark, tmp_path, docs):
    """A doc arriving in batch 2 that near-duplicates a batch-1 doc
    is dropped with dup_of pointing at the EARLIER doc."""
    state = NearDupState(str(tmp_path / "s"))
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    process_neardup_batch(spark, b1, state, "b1", THR)
    # batch 2 = exact copies of 5 batch-1 docs under new ids
    clones = (
        b1.orderBy("doc_id")
        .limit(5)
        .select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    )
    got = _verdict_map(process_neardup_batch(spark, clones, state, "b2", THR))
    for new_id, (keep, dup_of) in got.items():
        assert keep == 0, f"clone {new_id} was not deduplicated"
        assert dup_of == new_id - 1_000_000
    # nothing from batch 2 entered the registry
    reg_ids = {
        r["doc_id"] for r in state.sigs.read(spark).select("doc_id").collect()
    }
    assert not any(i >= 1_000_000 for i in reg_ids)


def test_replay_reproduces_verdicts(spark, tmp_path, docs):
    state = NearDupState(str(tmp_path / "s"))
    b = docs.filter(F.col("doc_id") % 3 == 0)
    first = _verdict_map(process_neardup_batch(spark, b, state, "b0", THR))
    v = state.sigs.latest_version()
    replay = _verdict_map(process_neardup_batch(spark, b, state, "b0", THR))
    assert replay == first
    assert state.sigs.latest_version() == v  # no second commit


def test_incompatible_registry_config_rejected(spark, tmp_path, docs):
    """ADVICE r4: a registry written under another gate configuration
    (different verify mode here; perms/banding by proxy) must raise,
    not silently pass previously-registered near-dups as keeps."""
    state = NearDupState(str(tmp_path / "s"))
    b = docs.filter(F.col("doc_id") % 3 == 0)
    process_neardup_batch(spark, b, state, "b0", THR, exact_verify=True)
    with pytest.raises(ValueError, match="gate config"):
        process_neardup_batch(
            spark, b, state, "b1", THR, exact_verify=False
        )
    # a registry with rows but NO stamp (written by an older gate) is
    # rejected too — its probe compatibility cannot be verified
    m = state.sigs.manifest()
    m["meta"].pop("gate_config")
    import json as _json
    import os as _os

    path = _os.path.join(
        state.sigs.log_dir, f"{state.sigs.latest_version():08d}.json"
    )
    with open(path, "w") as f:
        _json.dump(m, f)
    with pytest.raises(ValueError, match="stamping"):
        process_neardup_batch(spark, b, state, "b2", THR)


def test_registry_appends_take_driver_path_when_small(spark, tmp_path, docs):
    """r11 VERDICT next #2: the sids/signatures registry appends go
    through stage_files_auto — a metadata-sized batch stages
    driver-side instead of paying the ~1 s/table distributed-write
    floor twice. Asserted via the shared gate telemetry; verdict
    correctness under this path is covered by the equality tests
    above (same code path)."""
    from nfl_data_pipeline_spark.operators.hints import drain_gate_events

    state = NearDupState(str(tmp_path / "s"))
    drain_gate_events()
    process_neardup_batch(spark, docs, state, "b0", THR)
    evs = {
        e["site"]: e for e in drain_gate_events()
        if e["site"].endswith("-append")
    }
    assert evs["neardup.py:sids-append"]["path"] == "driver"
    assert evs["neardup.py:sigs-append"]["path"] == "driver"
