"""64-bit SimHash banding (operators/dedup.py): recall on planted
near-dups, band/fingerprint consistency incl. the sign bit, and the
hot-bucket cap that bounds candidate generation under a duplicate
flood (the banding analog of ngram_jaccard's max_df)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

import nfl_data_pipeline_spark.operators.dedup as dd
from nfl_data_pipeline_spark.operators.hashing import SIMHASH_BANDS


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


@pytest.fixture(autouse=True)
def _fresh_cache():
    dd.clear_sids_cache()
    yield
    dd.clear_sids_cache()


BASE = (
    "the quick brown fox jumps over the lazy dog while seventeen "
    "green bottles hang on the wall and autumn rain keeps falling "
    "softly on the tin roof of the old farmhouse near the river bend "
    "where children play every single afternoon until dusk settles"
)


def test_planted_near_dup_recall_and_exact_zero(spark):
    """An identical copy has hamming 0; a one-word edit stays within
    the hamming budget; an unrelated doc pairs with neither."""
    rows = [
        (1, BASE),
        (2, BASE),  # exact copy
        (3, BASE.replace("autumn", "winter")),  # near dup
        (4, "completely different text about spark sql execution "
            "plans and adaptive query optimization at terabyte scale "
            "with shuffle partition coalescing and skew join splits "
            "plus broadcast thresholds and codegen stage boundaries"),
    ]
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dd.simhash_near_pairs(_docs(spark, rows)).collect()
    }
    assert pairs.get((1, 2)) == 0
    # strict default (max_hamming=2): the one-word edit lands at
    # hamming ~6 on a ~45-shingle doc — below the radar, by design
    assert (1, 3) not in pairs
    assert not any(4 in p for p in pairs)

    # widen the hamming budget (banding re-derives: 7 bands of 9-10
    # bits) and the edit is recalled while the unrelated doc stays out
    loose = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in dd.simhash_near_pairs(
            _docs(spark, rows), max_hamming=6
        ).collect()
    }
    assert (1, 3) in loose and loose[(1, 3)] <= 6
    assert not any(4 in p for p in loose)


def test_bands_consistent_with_fingerprint(spark):
    """band0..band2 must equal the corresponding bit ranges of the
    signed 64-bit fingerprint (two's complement — bit 63 is the sign
    bit, the cross-engine trap the vote-derived banding avoids)."""
    rows = [(i, BASE.replace("fox", w)) for i, w in enumerate(
        ["fox", "cat", "owl", "elk", "bat", "yak", "emu", "ram"]
    )]
    got = dd.with_simhash(_docs(spark, rows), with_bands=True).collect()
    assert len(got) == len(rows)
    seen_negative = False
    for r in got:
        sh = r["simhash"]
        assert -(1 << 63) <= sh < (1 << 63)
        seen_negative |= sh < 0
        unsigned = sh & ((1 << 64) - 1)  # two's complement view
        for bi, (off, width) in enumerate(SIMHASH_BANDS):
            want = (unsigned >> off) & ((1 << width) - 1)
            assert r[f"band{bi}"] == want, (bi, sh)
    # with 8 random-ish 64-bit hashes, P(all sign bits clear) ≈ 0.4%;
    # if this ever flakes the projections are biased — worth knowing
    assert seen_negative


def test_hot_bucket_cap_bounds_flood(spark):
    """A 300-copy boilerplate flood: uncapped banding yields ~45k
    intra-flood pairs; max_bucket drops the flood's buckets from
    candidate generation while a modest near-dup pair elsewhere is
    still found through its (cold) bands."""
    flood = [(i, BASE) for i in range(300)]
    other = [
        (1000, BASE.replace("river", "harbor").replace("quick", "slow")
         + " distinct tail marker alpha beta gamma delta epsilon"),
        (1001, BASE.replace("river", "harbor").replace("quick", "slow")
         + " distinct tail marker alpha beta gamma delta zeta"),
    ]
    docs = _docs(spark, flood + other)

    uncapped = dd.simhash_near_pairs(docs)
    n_uncapped = uncapped.count()
    assert n_uncapped >= 300 * 299 // 2  # the quadratic blow-up, live

    capped = dd.simhash_near_pairs(docs, max_bucket=50)
    got = {
        (r["doc_a"], r["doc_b"]) for r in capped.collect()
    }
    assert (1000, 1001) in got  # cold-bucket recall intact
    assert all(a >= 1000 for a, _ in got)  # flood contributed nothing
    # and the candidate volume is actually bounded, not just filtered
    assert len(got) < 10
