"""Cross-shard packing rebalance (operators/packing.py): FFD
strictness, chunk-strategy overflow bound, and that the pass actually
improves fill uniformity over the stranded tail bins."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.packing import (
    rebalance_tail_bins,
    underfull_bins,
)

BUDGET = 256
THRESH = 0.85


@pytest.fixture(scope="module")
def bins(spark):
    """Per-shard packed bins from the smoke corpus (same derivation
    as the registered sequence_packing query)."""
    from nfl_data_pipeline_spark.catalog import load
    from nfl_data_pipeline_spark.queries.llmprep import _chunked_docs

    from tests.conftest import SF_SMOKE

    b = (
        _chunked_docs(load(spark, SF_SMOKE, "documents"))
        .groupBy("source", "bin_id")
        .agg(F.sum("n_tokens").cast("long").alias("bin_tokens"))
    )
    b.persist().count()
    yield b
    b.unpersist()


def test_ffd_groups_never_exceed_budget(spark, bins):
    out = rebalance_tail_bins(bins, BUDGET, THRESH, strategy="ffd").collect()
    assert out  # smoke corpus has tails (many sources)
    groups = {}
    for r in out:
        groups.setdefault(r["merged_bin"], []).append(r)
    for rows in groups.values():
        total = sum(r["bin_tokens"] for r in rows)
        assert total <= BUDGET  # the strict FFD guarantee
        assert all(r["merged_tokens"] == total for r in rows)


def test_chunk_overflow_bounded_and_totals_match(spark, bins):
    out = rebalance_tail_bins(bins, BUDGET, THRESH, strategy="chunk").collect()
    groups = {}
    for r in out:
        groups.setdefault(r["merged_bin"], 0)
        groups[r["merged_bin"]] += r["bin_tokens"]
    bound = BUDGET + int(BUDGET * THRESH)  # ≤ one underfull bin over
    for total in groups.values():
        assert total < bound


def test_every_underfull_bin_assigned_exactly_once(spark, bins):
    under = {
        (r["source"], r["bin_id"])
        for r in underfull_bins(bins, BUDGET, THRESH).collect()
    }
    for strategy in ("ffd", "chunk"):
        got = [
            (r["source"], r["bin_id"])
            for r in rebalance_tail_bins(
                bins, BUDGET, THRESH, strategy=strategy
            ).collect()
        ]
        assert len(got) == len(set(got)) == len(under)
        assert set(got) == under


def test_rebalance_improves_fill(spark, bins):
    """Mean fill of merged groups beats mean fill of the stranded
    bins — the reason the pass exists."""
    under = underfull_bins(bins, BUDGET, THRESH).collect()
    before = sum(r["bin_tokens"] for r in under) / (len(under) * BUDGET)
    out = rebalance_tail_bins(bins, BUDGET, THRESH, strategy="ffd").collect()
    n_groups = len({r["merged_bin"] for r in out})
    after = sum(r["bin_tokens"] for r in out) / (n_groups * BUDGET)
    assert after > before
    assert n_groups < len(under)  # fewer, fuller sequences


def test_ffd_deterministic(spark, bins):
    a = sorted(map(tuple, rebalance_tail_bins(bins, BUDGET).collect()))
    b = sorted(map(tuple, rebalance_tail_bins(bins, BUDGET).collect()))
    assert a == b


def test_ffd_synthetic_adversarial(spark):
    """Sizes crafted so greedy next-fit would strand capacity but FFD
    packs tightly; also exercises the multi-open-group path."""
    rows = [
        ("s0", 0, 130),
        ("s1", 0, 130),
        ("s2", 0, 120),
        ("s3", 0, 120),
        ("s4", 0, 6),
        ("s5", 0, 6),
        ("s6", 0, 100),
    ]
    bins = spark.createDataFrame(rows, "source string, bin_id long, bin_tokens long")
    out = rebalance_tail_bins(bins, 256, 0.85, strategy="ffd").collect()
    groups = {}
    for r in out:
        groups.setdefault(r["merged_bin"], 0)
        groups[r["merged_bin"]] += r["bin_tokens"]
    assert all(v <= 256 for v in groups.values())
    # FFD: 130+120+6 | 130+120+6 | 100 → 3 groups (next-fit desc
    # would open 4: 130+120 | 130+120 | 100+6+6 is also 3... assert
    # optimal bound instead: ceil(612/256)=3)
    assert len(groups) == 3
