"""Versioned ANN index (streaming/annindex): codebook sidecar moves
atomically with the vector rows, batches assign against the STORED
router (no implicit retrain), replay is a no-op, rebuilds are pinned
against racing batches, and forget purges rewrite only the touched
cells while marking them stale for the next rebuild."""

from __future__ import annotations

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.operators.similarity import cosine_topk
from nfl_data_pipeline_spark.streaming.annindex import (
    AnnIndexState,
    ann_query,
    maintain_ann_state,
    process_ann_batch,
    purge_ann_vectors,
    rebuild_ann_index,
)

DIM = 8


def _vectors(spark, n, seed=7, start_id=0):
    """n vectors in 4 well-separated gaussian clumps."""
    rng = np.random.default_rng(seed)
    anchors = rng.normal(0, 10, (4, DIM))
    rows = [
        (
            start_id + i,
            [float(x) for x in anchors[i % 4] + rng.normal(0, 0.5, DIM)],
        )
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _topk_map(df):
    return {
        (r["q_id"], r["rank"]): r["vec_id"] for r in df.collect()
    }


def test_incremental_build_and_query(spark, tmp_path):
    state = AnnIndexState(str(tmp_path / "ann"), n_cells=4)
    for b in range(3):
        batch = _vectors(spark, 60, seed=b, start_id=1000 * b)
        out = process_ann_batch(spark, batch, state, f"b{b}")
        assert out["applied"]
    # full-probe search == exact brute force over the same corpus
    stored = state.vectors.read(spark).select(
        "vec_id", F.col("vec").alias("embedding")
    )
    queries = _vectors(spark, 8, seed=99, start_id=50_000)
    got = _topk_map(
        ann_query(spark, state, queries, k=3, n_probe=4)
    )
    want = {
        (r["q_id"], r["rank"]): r["c_id"]
        for r in cosine_topk(queries, stored, k=3).collect()
    }
    assert got == want
    # probing 1 of 4 well-separated cells still finds most neighbors
    near = _topk_map(ann_query(spark, state, queries, k=3, n_probe=1))
    hit = sum(1 for kk, v in near.items() if want.get(kk) == v)
    assert hit / len(want) >= 0.6


def test_router_is_stable_across_batches_and_replay(spark, tmp_path):
    state = AnnIndexState(str(tmp_path / "ann"), n_cells=4)
    process_ann_batch(spark, _vectors(spark, 40, seed=0), state, "b0")
    book_path0 = state.vectors.meta().get("codebook")
    assert book_path0 and os.path.exists(book_path0)
    process_ann_batch(
        spark, _vectors(spark, 40, seed=1, start_id=1000), state, "b1"
    )
    # the second batch did NOT retrain the router
    assert state.vectors.meta().get("codebook") == book_path0
    v = state.vectors.latest_version()
    queries = _vectors(spark, 5, seed=42, start_id=9_000)
    before = _topk_map(ann_query(spark, state, queries, k=3, n_probe=4))
    # replay: no new version, same answers
    out = process_ann_batch(
        spark, _vectors(spark, 40, seed=1, start_id=1000), state, "b1"
    )
    assert not out["applied"]
    assert state.vectors.latest_version() == v
    assert _topk_map(ann_query(spark, state, queries, k=3, n_probe=4)) == before
    # an index built under a different cell count is rejected
    with pytest.raises(ValueError, match="gate config"):
        process_ann_batch(
            spark,
            _vectors(spark, 10, seed=2, start_id=5000),
            AnnIndexState(str(tmp_path / "ann"), n_cells=8),
            "b2",
        )


def test_rebuild_crash_window_and_race(spark, tmp_path, monkeypatch):
    state = AnnIndexState(str(tmp_path / "ann"), n_cells=4)
    process_ann_batch(spark, _vectors(spark, 60, seed=0), state, "b0")
    queries = _vectors(spark, 5, seed=42, start_id=9_000)
    before = _topk_map(ann_query(spark, state, queries, k=3, n_probe=4))
    v0 = state.vectors.latest_version()

    # crash DURING a rebuild: rows staged, sidecar written, no commit
    # — readers still see the old index, verbatim
    stored = state.vectors.read(spark)
    orphan = state.vectors.stage_files(stored, "cell")
    state.save_codebook({"centroids": [[0.0] * DIM], "trained_version": -9})
    assert state.vectors.latest_version() == v0
    assert _topk_map(ann_query(spark, state, queries, k=3, n_probe=4)) == before
    # single-writer vacuum reaps the orphan staging
    state.vectors.vacuum(retain_versions=1, grace_s=0.0)
    assert not any(os.path.exists(a["path"]) for a in orphan)

    # a racing batch lands between the rebuild's snapshot read and
    # its commit: the pinned commit conflicts and the retry refits
    # from the NEW snapshot (the racer's rows survive the rebuild)
    orig = TxTable.commit
    raced = {"done": False}

    def racing_commit(self, adds, **kw):
        if not raced["done"] and kw.get("expected_version") is not None:
            raced["done"] = True
            racer = _vectors(spark, 10, seed=5, start_id=77_000)
            book = AnnIndexState.codebook(state)
            from nfl_data_pipeline_spark.streaming.annindex import (
                _assigned_rows,
                _centroid_df,
            )

            rows = _assigned_rows(
                racer.select(
                    F.col("vec_id").alias("vid"),
                    F.col("embedding").alias("vec"),
                ),
                _centroid_df(spark, book),
            )
            orig(self, self.stage_files(rows, "cell"), batch_id="racer")
        return orig(self, adds, **kw)

    monkeypatch.setattr(TxTable, "commit", racing_commit)
    out = rebuild_ann_index(spark, state)
    monkeypatch.setattr(TxTable, "commit", orig)
    assert out["rebuilt"]
    ids = {
        r["vec_id"]
        for r in state.vectors.read(spark).select("vec_id").collect()
    }
    assert 77_000 in ids, "racer's rows lost by the rebuild"
    book = state.codebook()
    assert book["trained_version"] >= v0 + 1


def test_forget_purge_marks_stale_and_rebuild_clears(spark, tmp_path):
    state = AnnIndexState(str(tmp_path / "ann"), n_cells=4)
    process_ann_batch(spark, _vectors(spark, 80, seed=0), state, "b0")
    stored = state.vectors.read(spark)
    # two ids from ONE cell
    one_cell = stored.select("cell").limit(1).collect()[0]["cell"]
    doomed = [
        r["vec_id"]
        for r in stored.filter(F.col("cell") == one_cell)
        .select("vec_id")
        .limit(2)
        .collect()
    ]
    untouched_before = {
        f["path"]
        for f in state.vectors.live_files()
        if f["partition"] != str(one_cell)
    }
    out = purge_ann_vectors(spark, state, doomed)
    assert out["cells"] == [one_cell] and out["purged"] == 2
    # only the touched cell's files were rewritten
    untouched_after = {
        f["path"]
        for f in state.vectors.live_files()
        if f["partition"] != str(one_cell)
    }
    assert untouched_after == untouched_before
    # purged ids are gone from storage and from query results
    ids = {
        r["vec_id"]
        for r in state.vectors.read(spark).select("vec_id").collect()
    }
    assert not (set(doomed) & ids)
    queries = _vectors(spark, 6, seed=3, start_id=60_000)
    res = ann_query(spark, state, queries, k=5, n_probe=4)
    assert not (
        set(doomed) & {r["vec_id"] for r in res.collect()}
    )
    # staleness recorded; maintenance rebuild clears it
    assert state.vectors.meta().get("stale_cells") == [one_cell]
    stats = maintain_ann_state(
        spark, state, min_files=1, rebuild_stale_threshold=1
    )
    assert stats["rebuild"]["rebuilt"]
    assert state.vectors.meta().get("stale_cells") == []
    # the refit codebook is pinned to the post-purge snapshot
    assert state.codebook()["trained_version"] >= 1


def test_purge_without_matches_is_noop(spark, tmp_path):
    state = AnnIndexState(str(tmp_path / "ann"), n_cells=4)
    process_ann_batch(spark, _vectors(spark, 20, seed=0), state, "b0")
    v = state.vectors.latest_version()
    out = purge_ann_vectors(spark, state, [999_999])
    assert out == {"cells": [], "purged": 0}
    assert state.vectors.latest_version() == v


def test_pq_index_versioned_codes_and_query(spark, tmp_path):
    """PQ on the versioned sidecar: rows carry codes encoded against
    the stored books, a shortlist >= corpus makes the ADC path
    EQUAL the exact path (rerank covers everything), and a tight
    shortlist still finds most true neighbors."""
    state = AnnIndexState(str(tmp_path / "pq"), n_cells=4, pq_m=4)
    for b in range(2):
        process_ann_batch(
            spark, _vectors(spark, 60, seed=b, start_id=1000 * b), state, f"b{b}"
        )
    book = state.codebook()
    assert book.get("pq_books") is not None
    stored = state.vectors.read(spark)
    assert "codes" in stored.columns
    assert stored.filter(F.size("codes") != 4).count() == 0

    queries = _vectors(spark, 6, seed=77, start_id=40_000)
    exact = _topk_map(ann_query(spark, state, queries, k=3, n_probe=4))
    full = _topk_map(
        ann_query(
            spark, state, queries, k=3, n_probe=4, use_pq=True,
            shortlist=10_000,
        )
    )
    assert full == exact
    tight = _topk_map(
        ann_query(
            spark, state, queries, k=3, n_probe=4, use_pq=True, shortlist=10
        )
    )
    # the PQ contract is the retrieved id-SET (ranks may swap when the
    # shortlist truncates near-ties — pq_topk's own documented bound)
    def ids_by_q(m):
        out = {}
        for (qid, _rk), vid in m.items():
            out.setdefault(qid, set()).add(vid)
        return out

    te, ta = ids_by_q(exact), ids_by_q(tight)
    recall = sum(
        len(te[qd] & ta.get(qd, set())) / len(te[qd]) for qd in te
    ) / len(te)
    assert recall >= 0.6
    # a non-PQ index refuses the PQ path loudly
    plain = AnnIndexState(str(tmp_path / "plain"), n_cells=4)
    process_ann_batch(spark, _vectors(spark, 20, seed=0), state=plain,
                      batch_id="b0")
    with pytest.raises(ValueError, match="without pq_m"):
        ann_query(spark, plain, queries, use_pq=True)
    # and the PQ shape is part of the stamped config: a state opened
    # with different pq params is rejected before any work
    with pytest.raises(ValueError, match="gate config"):
        process_ann_batch(
            spark,
            _vectors(spark, 10, seed=3, start_id=9_000),
            AnnIndexState(str(tmp_path / "pq"), n_cells=4, pq_m=2),
            "b9",
        )


def test_pq_rebuild_and_purge_keep_codes_consistent(spark, tmp_path):
    """Purge + rebuild on a PQ index: codes re-encode against the
    REFIT books in the same pinned commit (never stale codes under
    new books)."""
    state = AnnIndexState(str(tmp_path / "pq"), n_cells=4, pq_m=4)
    process_ann_batch(spark, _vectors(spark, 60, seed=0), state, "b0")
    doomed = [
        r["vec_id"]
        for r in state.vectors.read(spark).select("vec_id").limit(2).collect()
    ]
    purge_ann_vectors(spark, state, doomed)
    out = rebuild_ann_index(spark, state)
    assert out["rebuilt"]
    book = state.codebook()
    assert book.get("pq_books") is not None
    # every stored code re-derives from the stored vector + new books
    from nfl_data_pipeline_spark.operators.similarity import pq_encode_udf

    stored = state.vectors.read(spark)
    mismatch = (
        stored.withColumn(
            "_re", pq_encode_udf(book["pq_books"])("vec")
        )
        .filter(F.col("_re") != F.col("codes"))
        .count()
    )
    assert mismatch == 0


def test_opq_rotation_versions_with_codes(spark, tmp_path):
    """OPQ on the versioned sidecar: the learned rotation is stored
    with the books, encode/ADC both apply it, and the full-shortlist
    PQ path still equals the exact path (rotation preserves L2, so
    the rerank semantics are unchanged)."""
    state = AnnIndexState(
        str(tmp_path / "opq"), n_cells=4, pq_m=4, opq=True
    )
    process_ann_batch(spark, _vectors(spark, 80, seed=0), state, "b0")
    book = state.codebook()
    assert book.get("pq_rotation") is not None
    # R orthonormal
    R = np.array(book["pq_rotation"])
    assert np.allclose(R @ R.T, np.eye(DIM), atol=1e-9)
    queries = _vectors(spark, 5, seed=21, start_id=70_000)
    exact = _topk_map(ann_query(spark, state, queries, k=3, n_probe=4))
    full = _topk_map(
        ann_query(
            spark, state, queries, k=3, n_probe=4, use_pq=True,
            shortlist=10_000,
        )
    )
    assert full == exact
    # re-encode check: stored codes derive from vec + books + rotation
    from nfl_data_pipeline_spark.operators.similarity import pq_encode_udf

    stored = state.vectors.read(spark)
    mismatch = (
        stored.withColumn(
            "_re",
            pq_encode_udf(book["pq_books"], book["pq_rotation"])("vec"),
        )
        .filter(F.col("_re") != F.col("codes"))
        .count()
    )
    assert mismatch == 0
    # opq-ness is part of the stamped config
    with pytest.raises(ValueError, match="gate config"):
        process_ann_batch(
            spark,
            _vectors(spark, 10, seed=5, start_id=8_000),
            AnnIndexState(str(tmp_path / "opq"), n_cells=4, pq_m=4),
            "b9",
        )


def test_pq_recall_curve_floor(spark, tmp_path):
    """The rerank-depth dial (tools/annindex_scale.py pq_tier, the r8
    VERDICT item): at a fixed seed and an ADC-RESOLVABLE geometry,
    recall@5 vs the exact path rises monotonically with shortlist
    and clears a pinned floor at each depth. 64-dim / pq_m=8 so each
    subspace quantizes 8 dims into 16 codes — the module's 8-dim
    fixtures would make PQ scalar quantization (16 levels per single
    dimension, near-lossless: recall 1.0 at every depth, a vacuous
    curve). Measured at this seed: [0.38, 0.66, 1.0, 1.0]."""
    dim = 64
    rng = np.random.default_rng(123)
    anchors = rng.normal(0, 1.0, (8, dim))
    rows = [
        (
            i,
            [float(x) for x in anchors[i % 8] + rng.normal(0, 0.9, dim)],
        )
        for i in range(800)
    ]
    corpus = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    state = AnnIndexState(str(tmp_path / "pqc"), n_cells=8, pq_m=8)
    process_ann_batch(spark, corpus, state, "b0")
    q_rows = [
        (
            10_000 + i,
            [float(x) for x in anchors[i % 8] + rng.normal(0, 0.9, dim)],
        )
        for i in range(10)
    ]
    queries = spark.createDataFrame(
        q_rows, "vec_id long, embedding array<double>"
    )
    # n_probe = all cells: the router misses nothing, so the curve
    # isolates the ADC-shortlist loss
    exact_pairs = {
        (r["q_id"], r["vec_id"])
        for r in ann_query(spark, state, queries, k=5, n_probe=8).collect()
    }
    recalls = []
    for s in (10, 40, 160, 800):
        got = {
            (r["q_id"], r["vec_id"])
            for r in ann_query(
                spark, state, queries, k=5, n_probe=8,
                use_pq=True, shortlist=s,
            ).collect()
        }
        recalls.append(len(got & exact_pairs) / len(exact_pairs))
    assert recalls == sorted(recalls)  # deeper rerank never hurts
    assert recalls[-1] == 1.0  # shortlist >= corpus covers everything
    assert recalls[2] >= 0.9  # 20% of the corpus reranked
    assert recalls[1] >= 0.5  # 5% reranked
    assert recalls[0] >= 0.25  # 1.25% reranked still beats noise
