"""Bloom prefilter (operators/bloom.py) and its funnel integration:
no false negatives ever, measured fpp near design, batch-equivalence
of the bloom-prefiltered dedup gate (including under a deliberately
undersized bloom, where correctness must survive a high
false-positive rate), replay idempotence, and the manifest-pruning
contract (bloom-negative batches read zero registry files)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.operators.bloom import (
    Bloom,
    bloom_from_df,
    bloom_params,
    update_bloom,
    with_might_contain,
)
from nfl_data_pipeline_spark.streaming.funnel import (
    FunnelState,
    process_funnel_batch,
    read_funnel_counts,
)
from tests.conftest import SF_SMOKE


def _keys(spark, prefix, n):
    return spark.range(n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("key")
    )


def test_params_sizing():
    m, k = bloom_params(2_000_000, 0.01)
    assert m % 64 == 0
    assert 9 * 2_000_000 < m < 11 * 2_000_000  # ~9.6 bits/key
    assert 5 <= k <= 9  # ~6.9 optimal


def test_no_false_negatives_and_fpp(spark):
    inserted = _keys(spark, "in-", 5000)
    others = _keys(spark, "out-", 5000)
    bloom = bloom_from_df(inserted, "key", capacity=5000, fpp=0.01)
    hits = with_might_contain(spark, inserted, "key", bloom)
    assert hits.filter(~F.col("_maybe")).count() == 0  # never a false negative
    fp = with_might_contain(spark, others, "key", bloom)
    fpp = fp.filter(F.col("_maybe")).count() / 5000
    assert fpp < 0.05, f"measured fpp {fpp} far above the 1% design point"


def test_incremental_update_equals_bootstrap(spark):
    all_keys = _keys(spark, "k-", 4000)
    boot = bloom_from_df(all_keys, "key", capacity=4000, fpp=0.01)
    inc = Bloom.empty(4000, 0.01)
    for i in range(4):
        update_bloom(
            all_keys.filter(F.col("key").substr(3, 10).cast("long") % 4 == i),
            "key",
            inc,
        )
    assert (boot.bits == inc.bits).all()


def test_serialization_roundtrip(tmp_path, spark):
    bloom = bloom_from_df(_keys(spark, "s-", 100), "key", 100, 0.01)
    p = str(tmp_path / "x.blm")
    bloom.save(p)
    loaded = Bloom.load(p)
    assert loaded.m_bits == bloom.m_bits and loaded.k == bloom.k
    assert (loaded.bits == bloom.bits).all()


def _run_funnel(spark, root, docs, n_batches=3, **state_kw):
    state = FunnelState(root, **state_kw)
    for i in range(n_batches):
        process_funnel_batch(
            spark,
            docs.filter(F.col("doc_id") % n_batches == i),
            state,
            f"b{i}",
        )
    return state


def _counts(spark, state):
    return sorted(
        tuple(r) for r in read_funnel_counts(spark, state).collect()
    )


def _registry(spark, state):
    df = state.fps.read(spark)
    return sorted(
        (r["fp"], r["doc_id"]) for r in df.select("fp", "doc_id").collect()
    )


@pytest.fixture(scope="module")
def docs(spark):
    return load(spark, SF_SMOKE, "documents")


def test_bloom_path_equals_plain_path(spark, tmp_path, docs):
    plain = _run_funnel(spark, str(tmp_path / "p"), docs, use_bloom=False)
    bloomed = _run_funnel(
        spark, str(tmp_path / "b"), docs, use_bloom=True, bloom_engage_bytes=0
    )
    assert _counts(spark, plain) == _counts(spark, bloomed)
    assert _registry(spark, plain) == _registry(spark, bloomed)
    assert state_has_bloom(bloomed)


def test_undersized_bloom_still_correct(spark, tmp_path, docs):
    """A bloom sized 100× too small saturates with false positives —
    every false positive just probes the registry and finds nothing,
    so the output must not change (the bloom is an optimization, not
    a semantic gate)."""
    plain = _run_funnel(spark, str(tmp_path / "p"), docs, use_bloom=False)
    tiny = _run_funnel(
        spark,
        str(tmp_path / "t"),
        docs,
        bloom_capacity=10,
        bloom_fpp=0.5,
        bloom_engage_bytes=0,
    )
    assert _counts(spark, plain) == _counts(spark, tiny)
    assert _registry(spark, plain) == _registry(spark, tiny)


def state_has_bloom(state) -> bool:
    return "bloom" in state.fps.meta()


def test_replay_after_partial_crash_with_bloom(spark, tmp_path, docs):
    """Crash between the fps commit and the counts commit, then
    replay: the bloom now contains the batch's own fps, the probe
    finds each winner's own doc_id, and the final counts equal the
    uninterrupted run."""
    b0 = docs.filter(F.col("doc_id") % 2 == 0)
    b1 = docs.filter(F.col("doc_id") % 2 == 1)

    ref = FunnelState(str(tmp_path / "ref"), bloom_engage_bytes=0)
    process_funnel_batch(spark, b0, ref, "b0")
    process_funnel_batch(spark, b1, ref, "b1")

    crash = FunnelState(str(tmp_path / "crash"), bloom_engage_bytes=0)
    process_funnel_batch(spark, b0, crash, "b0")
    # simulate the crash: replace counts with a table that never saw
    # b1 by applying b1's fps/vocab commits but not its counts commit
    import nfl_data_pipeline_spark.streaming.funnel as fun

    # the counts commit is the only commit_grouped_sums call in the
    # funnel (vocab merges through merge_grouped_sums, whose internal
    # commit this patch does not touch)
    orig = fun.commit_grouped_sums

    def dropping(table, prep, batch_id):
        raise RuntimeError("simulated crash before counts commit")

    fun.commit_grouped_sums = dropping
    try:
        with pytest.raises(RuntimeError, match="simulated crash"):
            process_funnel_batch(spark, b1, crash, "b1")
    finally:
        fun.commit_grouped_sums = orig

    assert crash.fps.is_applied("b1") and not crash.counts.is_applied("b1")
    process_funnel_batch(spark, b1, crash, "b1")  # replay
    assert _counts(spark, crash) == _counts(spark, ref)
    assert _registry(spark, crash) == _registry(spark, ref)


def test_all_new_batch_reads_no_registry_files(spark, tmp_path, docs):
    """The pruning contract: when a batch shares no fingerprints with
    the registry (and the bloom yields no false positives at sane
    sizing), the probe set is empty and NOT ONE registry file is
    opened. Verified by counting TxTable.read partition requests."""
    state = FunnelState(str(tmp_path / "s"), bloom_engage_bytes=0)
    half_a = docs.filter(F.col("doc_id") % 4 == 0)
    half_b = docs.filter(F.col("doc_id") % 4 == 1)
    process_funnel_batch(spark, half_a, state, "b0")

    # doc fixtures contain planted exact duplicates across the corpus,
    # so restrict batch 2 to fps absent from the registry
    stored_fps = {r[0] for r in state.fps.read(spark).select("fp").collect()}
    reads = []
    orig_read = type(state.fps).read

    def spy(self, spark_, version=None, partitions=None, ranges=None):
        if self is state.fps:
            reads.append(partitions)
        return orig_read(self, spark_, version, partitions, ranges)

    type(state.fps).read = spy
    try:
        from nfl_data_pipeline_spark.queries.llmprep import funnel_base

        new_only_ids = [
            r["doc_id"]
            for r in funnel_base(half_b).select("doc_id", "fp").collect()
            if r["fp"] not in stored_fps
        ]
        batch = half_b.filter(F.col("doc_id").isin(new_only_ids))
        process_funnel_batch(spark, batch, state, "b1")
    finally:
        type(state.fps).read = orig_read

    probe_reads = [p for p in reads if p is not None]
    assert probe_reads == [] or all(len(p) == 0 for p in probe_reads), (
        f"bloom-negative batch still probed registry partitions: {reads}"
    )


def test_update_switches_to_dense_payload(spark):
    """A batch whose position count exceeds the bitmap size must fold
    to dense per-partition payloads (bounded collect) and still set
    exactly the right bits."""
    keys = _keys(spark, "d-", 3000).repartition(2)
    tiny = Bloom.empty(capacity=40, fpp=0.01)  # ~48 bytes of bitmap
    n_payloads = update_bloom(keys, "key", tiny)
    assert n_payloads <= 2
    ref = bloom_from_df(keys, "key", capacity=40, fpp=0.01)
    assert (tiny.bits == ref.bits).all()
    # and membership still has no false negatives
    probed = with_might_contain(spark, keys, "key", tiny)
    assert probed.filter(~F.col("_maybe")).count() == 0


def test_maintenance_preserves_state_and_bloom(spark, tmp_path, docs):
    """Compaction+vacuum between batches must not change any gate
    outcome: counts, registry, replay markers, and the bloom sidecar
    all survive, and the next batch behaves identically to an
    unmaintained twin."""
    from nfl_data_pipeline_spark.streaming.funnel import (
        maintain_funnel_state,
    )

    ref = FunnelState(str(tmp_path / "ref"), bloom_engage_bytes=0)
    mnt = FunnelState(str(tmp_path / "mnt"), bloom_engage_bytes=0)
    for i in range(3):
        batch = docs.filter(F.col("doc_id") % 4 == i)
        process_funnel_batch(spark, batch, ref, f"b{i}")
        process_funnel_batch(spark, batch, mnt, f"b{i}")
        if i == 1:
            stats = maintain_funnel_state(spark, mnt, min_files=2)
            assert stats["fingerprints"]["compacted"] > 0
            assert "bloom" in mnt.fps.meta()  # sidecar pointer carried

    # maintenance shrank the file count
    assert len(mnt.fps.live_files()) <= len(ref.fps.live_files())
    assert _counts(spark, mnt) == _counts(spark, ref)
    assert _registry(spark, mnt) == _registry(spark, ref)
    # replay markers survived compaction/vacuum
    assert mnt.counts.is_applied("b2") and mnt.fps.is_applied("b2")
    # a replayed batch after maintenance is still a no-op
    before = _counts(spark, mnt)
    process_funnel_batch(
        spark, docs.filter(F.col("doc_id") % 4 == 1), mnt, "b1"
    )
    assert _counts(spark, mnt) == before


def test_scratch_persist_is_bounded(spark):
    from nfl_data_pipeline_spark.operators.dedup import (
        _SCRATCH_MAX,
        _SCRATCH_PERSISTS,
        scratch_persist,
    )

    start = len(_SCRATCH_PERSISTS)
    for i in range(_SCRATCH_MAX + 4):
        scratch_persist(spark.range(i + 1))
    assert len(_SCRATCH_PERSISTS) <= _SCRATCH_MAX


def test_maintenance_rebuild_tightens_bloom_after_forget(
    spark, tmp_path, docs
):
    """The incremental bloom only grows, so purged fingerprints keep
    answering 'maybe' (safe but wasteful). The maintenance rebuild
    re-derives the bitmap from the LIVE registry: the forgotten fp
    goes definitively negative while survivors keep the
    no-false-negative guarantee."""
    from nfl_data_pipeline_spark.jobs.forget import forget_docs_funnel
    from nfl_data_pipeline_spark.streaming.funnel import (
        maintain_funnel_state,
    )

    state = FunnelState(str(tmp_path / "f"), bloom_engage_bytes=0)
    batch = docs.filter(F.col("doc_id") < 120)
    process_funnel_batch(spark, batch, state, "b0")
    reg = state.fps.read(spark).select("doc_id", "fp").collect()
    target = min(r["doc_id"] for r in reg)
    target_fp = next(r["fp"] for r in reg if r["doc_id"] == target)

    forget_docs_funnel(spark, state, [target], batch_id="f0")
    # pre-rebuild: stale bloom still says maybe (safe false positive)
    stale = state.fp_bloom(spark)
    fp_df = spark.createDataFrame([(target_fp,)], "fp string")
    assert (
        with_might_contain(spark, fp_df, "fp", stale)
        .first()["_maybe"]
    )

    stats = maintain_funnel_state(spark, state, min_files=1)
    assert stats["bloom_rebuilt"]
    fresh = state.fp_bloom(spark)
    assert not (
        with_might_contain(spark, fp_df, "fp", fresh)
        .first()["_maybe"]
    ), "rebuilt bloom still maybes the purged fp"
    # survivors: no false negatives
    survivors = state.fps.read(spark).select("fp")
    probed = with_might_contain(spark, survivors, "fp", fresh)
    assert probed.filter(~F.col("_maybe")).count() == 0


def test_bloom_rebuild_pinned_against_concurrent_commit(
    spark, tmp_path, docs
):
    """ADVICE r5/r6 (streaming/funnel.py maintain_funnel_state): the
    rebuild used to commit its sidecar UNPINNED — a funnel batch
    landing between the registry read and the sidecar commit had its
    fps missing from the rebuilt bitmap (bloom false negatives: those
    dups silently pass the gate forever). The rebuild now pins
    expected_version and retries from the fresh snapshot on
    CommitConflict. Inject a concurrent batch exactly inside the
    read->commit window and assert every live registry fp still
    answers 'maybe' under the rebuilt bloom."""
    import nfl_data_pipeline_spark.streaming.funnel as funnel_mod
    from nfl_data_pipeline_spark.streaming.funnel import (
        maintain_funnel_state,
    )

    root = str(tmp_path / "f")
    state = FunnelState(root, bloom_engage_bytes=0)
    a = docs.filter(F.col("doc_id") % 2 == 0)
    b = docs.filter(F.col("doc_id") % 2 == 1)
    process_funnel_batch(spark, a, state, "b0")
    assert state.fps.meta().get("bloom")
    v_before = state.fps.latest_version()

    real = funnel_mod.bloom_from_df
    fired = {"n": 0}

    def inject_then_build(df, col, capacity, fpp):
        if fired["n"] == 0:
            fired["n"] += 1
            # the concurrent writer: lands AFTER maintenance pinned
            # its read version, BEFORE the sidecar commit
            process_funnel_batch(
                spark, b, FunnelState(root, bloom_engage_bytes=0), "b1"
            )
        return real(df, col, capacity, fpp)

    funnel_mod.bloom_from_df = inject_then_build
    try:
        stats = maintain_funnel_state(spark, state, min_files=1)
    finally:
        funnel_mod.bloom_from_df = real

    assert stats["bloom_rebuilt"]
    assert fired["n"] == 1  # injected once; the retry rebuilt cleanly
    assert state.fps.latest_version() > v_before + 1  # b1 + rebuild
    # no-false-negative invariant over the FULL live registry,
    # including the concurrently committed fps
    fresh = state.fp_bloom(spark)
    survivors = state.fps.read(spark).select("fp")
    probed = with_might_contain(spark, survivors, "fp", fresh)
    assert probed.filter(~F.col("_maybe")).count() == 0
