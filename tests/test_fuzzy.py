"""Fuzzy edit-distance join: the q-gram blocking must change COST,
never the ANSWER — every test compares against a brute-force cross
join over the same corpus."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.fuzzy import edit_distance_pairs


def _brute(spark, strings, k):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    a = df.select(F.col("s").alias("s_a"))
    b = df.select(F.col("s").alias("s_b"))
    return sorted(
        tuple(r)
        for r in (
            a.crossJoin(b)
            .filter(F.col("s_a") < F.col("s_b"))
            .withColumn("edit_dist", F.levenshtein("s_a", "s_b"))
            .filter(F.col("edit_dist") <= k)
            .select("s_a", "s_b", F.col("edit_dist").cast("int"))
        ).collect()
    )


def _fuzzy(spark, strings, k, **kw):
    df = spark.createDataFrame([(s,) for s in strings], "s string")
    return sorted(
        tuple(r) for r in edit_distance_pairs(df, "s", k=k, **kw).collect()
    )


def test_edge_lengths_exact(spark):
    # Every length regime in one corpus: empty, tiny (≤k), short
    # (1-gram leg), boundary lengths around q*(k+1), and long strings.
    strings = [
        "", "a", "b", "ab", "ba", "abc", "abd", "xyz",
        "abcdefgh", "abcdefghi", "abcdefghij",  # 8/9/10: gram-floor edge
        "abcdxfgh", "abcdefghijk",
        "the quick brown fox", "the quick brown fix",
        "the quick brwn fox", "a completely different string",
    ]
    for k in (1, 2):
        assert _fuzzy(spark, strings, k) == _brute(spark, strings, k)


def test_random_vocab_exact(spark):
    rng = random.Random(42)
    base = ["".join(rng.choice("abcde") for _ in range(rng.randint(0, 12)))
            for _ in range(80)]
    # plant mutated copies so true pairs exist at every distance
    mutated = []
    for s in base[:30]:
        if not s:
            continue
        p = rng.randrange(len(s))
        mutated.append(s[:p] + rng.choice("abcde") + s[p + 1:])  # subst
        mutated.append(s[:p] + s[p + 1:])  # delete
        mutated.append(s[:p] + "z" + s[p:])  # insert
    strings = sorted(set(base + mutated))
    assert _fuzzy(spark, strings, 2) == _brute(spark, strings, 2)


def test_duplicates_and_nulls_ignored(spark):
    df = spark.createDataFrame(
        [("kick",), ("kick",), ("kick",), ("lick",), (None,)], "s string"
    )
    rows = sorted(tuple(r) for r in edit_distance_pairs(df, "s", k=1).collect())
    assert rows == [("kick", "lick", 1)]


def test_max_df_drops_only_capped_gram_pairs(spark):
    # One ultra-hot gram ('aaa' in every string) plus a clean pair.
    strings = [f"aaaaaa{i:02d}" for i in range(20)] + ["zzzzyx", "zzzzyw"]
    exact = _fuzzy(spark, strings, 2)
    capped = _fuzzy(spark, strings, 2, max_df=3)
    # the clean pair survives the cap; capped output never invents pairs
    assert ("zzzzyw", "zzzzyx", 1) in capped
    assert set(capped) <= set(exact)


def test_empty_and_all_short_corpora(spark):
    """Regression: an empty ladder (empty corpus / every string ≤ k)
    must fall back to the tiny leg, not die building a zero-branch
    CASE expression."""
    empty = spark.createDataFrame([], "s string")
    assert edit_distance_pairs(empty, "s", k=2).count() == 0
    nulls = spark.createDataFrame([(None,)], "s string")
    assert edit_distance_pairs(nulls, "s", k=2).count() == 0
    short = spark.createDataFrame(
        [("a",), ("b",), ("ab",), ("",)], "s string"
    )
    got = sorted(
        tuple(r) for r in edit_distance_pairs(short, "s", k=2).collect()
    )
    # every length-compatible pair of ≤2-char strings is within 2
    want = _brute(spark, ["a", "b", "ab", ""], 2)
    assert got == want and len(got) > 0
