"""Fuzzy string matching: exact edit-distance self-join at scale.

Beyond-reference capability (entity resolution / vocabulary
canonicalization for curation pipelines): find every pair of distinct
strings within Levenshtein distance ``k`` WITHOUT the O(n²) cross
join. Classic q-gram blocking (Gravano et al., VLDB'01 approximate
string joins): an edit operation destroys at most ``q`` q-grams, so
two strings with ed ≤ k and max length L share at least
``L - (q-1) - k*q`` q-grams — a positive bound (hence ≥1 shared gram,
an equi-join key) whenever ``L ≥ q*(k+1)``. Shorter strings fall back
to 1-gram (shared character, guaranteed when ``L ≥ k+1``) and a tiny
``L ≤ k`` bucket where every length-compatible pair is trivially
within distance k. All candidates are verified with the built-in
JVM ``levenshtein`` — blocking affects cost only, never the answer.

Scale shape: explode distinct grams (output ≈ Σ len(s)), equi-join on
the gram (bucketed shuffle, no cross product), aggregate to candidate
pairs, verify. The optional ``max_df`` cap drops ultra-hot grams from
candidate generation — same contract as jaccard_pairs' hot-shingle
cap: bounded buckets, documented recall loss (a pair found ONLY via
capped grams is missed); default None keeps the join exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _grams_expr(col: str, q: int) -> str:
    """Spark SQL: distinct q-grams of ``col`` (1-based substring)."""
    return (
        f"array_distinct(transform(sequence(1, length({col}) - {q} + 1), "
        f"i -> substring({col}, i, {q})))"
    )


def edit_distance_pairs(
    df: DataFrame,
    str_col: str,
    k: int = 2,
    q: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """All pairs of DISTINCT values of ``str_col`` with
    ``levenshtein ≤ k`` — returns ``(s_a, s_b, edit_dist)`` with
    ``s_a < s_b``. Exact for ``max_df=None``; see module docstring
    for the blocking guarantee per length regime.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if q < 2:
        raise ValueError("q must be >= 2 (q=1 is the built-in fallback leg)")
    s = (
        df.select(F.col(str_col).alias("s"))
        .filter(F.col("s").isNotNull())
        .distinct()
        .withColumn("slen", F.length("s"))
    )
    gram_floor = q * (k + 1)  # pair guaranteed a shared q-gram at max-len ≥ this

    def posting(strings: DataFrame, gram_q: int) -> DataFrame:
        g = strings.select(
            "s", "slen", F.explode(F.expr(_grams_expr("s", gram_q))).alias("g")
        )
        if max_df is not None:
            w = Window.partitionBy("g")
            g = (
                g.withColumn("_df", F.count("*").over(w))
                .filter(F.col("_df") <= max_df)
                .drop("_df")
            )
        return g

    def candidates(post: DataFrame) -> DataFrame:
        a = post.select(
            F.col("s").alias("s_a"), F.col("slen").alias("la"), "g"
        )
        b = post.select(
            F.col("s").alias("s_b"), F.col("slen").alias("lb"), "g"
        )
        return (
            a.join(b, "g")
            .filter(
                (F.col("s_a") < F.col("s_b"))
                & (F.abs(F.col("la") - F.col("lb")) <= k)
            )
            .select("s_a", "s_b")
        )

    # Leg 1: q-grams over strings long enough to participate in a
    # guaranteed-gram pair (min side of such a pair has len ≥
    # gram_floor - k, and needs len ≥ q to have grams at all).
    long_side = s.filter(F.col("slen") >= max(q, gram_floor - k))
    leg_gram = candidates(posting(long_side, q))
    # Leg 2: shared-character (1-gram) blocking for the short regime —
    # both sides of a short pair have len ≤ gram_floor - 1 + k, and a
    # shared char is guaranteed when max-len ≥ k+1.
    short_side = s.filter(
        (F.col("slen") >= 1) & (F.col("slen") <= gram_floor - 1 + k)
    )
    leg_char = candidates(posting(short_side, 1))
    # Leg 3: strings of len ≤ k — any length-compatible pair is within
    # distance max(la, lb) ≤ k automatically; the bucket is bounded by
    # the alphabet (|Σ|^k) so a keyless join over it stays tiny.
    tiny = s.filter(F.col("slen") <= k).withColumn("_one", F.lit(1))
    leg_tiny = (
        tiny.select(F.col("s").alias("s_a"), "_one")
        .join(tiny.select(F.col("s").alias("s_b"), "_one"), "_one")
        .filter(F.col("s_a") < F.col("s_b"))
        .select("s_a", "s_b")
    )
    cand = leg_gram.unionByName(leg_char).unionByName(leg_tiny).distinct()
    return (
        cand.withColumn(
            "edit_dist", F.levenshtein(F.col("s_a"), F.col("s_b"))
        )
        .filter(F.col("edit_dist") <= k)
        .select("s_a", "s_b", F.col("edit_dist").cast("int").alias("edit_dist"))
    )
