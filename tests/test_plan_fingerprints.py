"""Shuffle-regression harness: the physical-operator fingerprint of
every front-window query is pinned against
tools/plan_fingerprints.json. An extra Exchange that sneaks into a
plan is invisible in sf0.01 timings but is a full reshuffle of the
table at 100 TB — this test makes it a loud diff instead.

Intentional plan changes: regenerate the golden with
``PYTHONPATH=. python tools/plan_fingerprints.py`` and commit it with
the change that moved the plan.
"""

from __future__ import annotations

import json

import pytest

from nfl_data_pipeline_spark.queries import PRIORITY, all_queries
from tools.plan_fingerprints import GOLDEN_PATH, fingerprint

from tests.conftest import SF_CORRECT

with open(GOLDEN_PATH) as _f:
    GOLDEN: dict = json.load(_f)

_WINDOW = [n for n in PRIORITY if n in GOLDEN][:50]


@pytest.mark.parametrize("name", _WINDOW)
def test_plan_fingerprint_pinned(name, spark):
    from tools.plan_fingerprints import fingerprint_of

    got = fingerprint_of(spark, all_queries()[name], SF_CORRECT)
    assert got == GOLDEN[name], (
        f"physical plan of {name} drifted from the golden fingerprint "
        f"(got {got}, pinned {GOLDEN[name]}). If intentional, "
        "regenerate tools/plan_fingerprints.json."
    )


def test_golden_covers_front_window():
    qs = all_queries()
    window = [n for n in PRIORITY if n in qs][:50]
    assert set(window) == set(GOLDEN), (
        "front-50 registry window and the fingerprint golden diverged; "
        "regenerate tools/plan_fingerprints.json"
    )


def test_no_unexpected_quadratic_joins():
    """BroadcastNestedLoopJoin is legitimate only where a broadcast
    fan-out is the algorithm (cross_join's work-plan grid, knn's
    broadcast query side, tfidf's 1-row corpus-count join).
    CartesianProduct (non-broadcast quadratic) is never acceptable."""
    # union_all_ragged carries the broadcast work-plan grid leg
    # (5×25 rows) since the r3 window consolidation; curation_funnel
    # and unigram_logprob broadcast a 1-row corpus aggregate.
    allowed_bnlj = {
        "union_all_ragged",
        "knn_search",
        "tfidf_top_terms",
        "curation_funnel",
        "unigram_logprob",
    }
    for name, fp in GOLDEN.items():
        assert not fp.get("CartesianProduct"), name
        if fp.get("BroadcastNestedLoopJoin"):
            assert name in allowed_bnlj, name
