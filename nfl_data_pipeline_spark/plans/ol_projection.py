"""OL projection core — reproduction of the engine-relevant moves of
``darko/2_ourlads_projections.R`` (633 lines of multi-source joins,
imputation, rank percentiles, quantile buckets; the GAM scoring is a
fixed-formula stand-in per SURVEY §7 hard-part 5).

Moves: full_join id resolution (``:62``), draft-pct imputation for
rookies (``:68-83``), per-position rank percentile
(``pct_normed = 100*(1+max(rank)-rank)/max(rank)``, ``:106-113``),
last-row-per-player slice_tail (``:38,105``), quantile tiers
(``:508-524``), top/bottom-k report slices (``:375-419``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nfl_data_pipeline_spark.operators.relational import r_join, top1_per_group


def latest_grade_per_player(player_grades: DataFrame) -> DataFrame:
    """slice_tail() per player (darko:38,105): most recent season row,
    explicit order."""
    return top1_per_group(
        player_grades, ["player_id"], [F.col("season").desc()]
    )


def impute_rookie_value(
    players: DataFrame, draft_picks: DataFrame
) -> DataFrame:
    """Rookies (no grade history) get a draft-position-derived value —
    the NA-coalesce idiom (darko:68-83): value = coalesce(grade,
    draft_pct) where draft_pct decays with pick number."""
    dp = draft_picks.select(
        F.col("pfr_name").alias("player"),
        (100.0 - F.col("pick") * 0.28).alias("draft_pct"),
    )
    # dplyr full_join semantics (darko:62): NA player names MATCH
    # and collapse to one row; SQL full_outer would keep two
    joined = r_join(players, dp, ["player"], "full_outer")
    return joined.withColumn(
        "value", F.coalesce(F.col("grades_pass_block"), F.col("draft_pct"))
    )


def normalize_position(
    df: DataFrame,
    col: str = "position",
    ourlads_col: str | None = "position_ourlads",
) -> DataFrame:
    """The reference's position cleanup (darko:68-77): missing PFF
    positions fall back to the ourlads depth-chart slot, then the
    side-specific slots collapse to the graded groups —
    LT/RT → T, LG/RG → G (centers stay C)."""
    out = df
    if ourlads_col is not None and ourlads_col in df.columns:
        out = out.withColumn(col, F.coalesce(F.col(col), F.col(ourlads_col)))
    return out.withColumn(
        col,
        F.when(F.col(col).isin("LT", "RT"), "T")
        .when(F.col(col).isin("LG", "RG"), "G")
        .otherwise(F.col(col)),
    )


def position_percentiles(valued: DataFrame) -> DataFrame:
    """Rank + pct_normed per position (darko:106-113, W8/W9).

    ``arrange(position, -value)`` puts NA values LAST (R arrange is
    NA-last on both directions; Spark's desc is NULLS LAST too), and
    the ``1:n()`` rank and ``max(rank)`` denominator INCLUDE those
    rows — a player with a NULL value (``impute_rookie_value`` leaves
    one when both the grade and the draft pick are missing) ranks at
    the bottom and widens every pct_normed denominator, exactly as in
    R (r9 fix: previously filtered out, which shrank the
    denominators)."""
    w = Window.partitionBy("position").orderBy(
        F.col("value").desc_nulls_last(), F.col("player").asc()
    )
    wall = Window.partitionBy("position")
    rank = F.row_number().over(w)
    mx = F.count("*").over(wall)
    return valued.select(
        "player",
        "position",
        "value",
        rank.alias("rank"),
        (100.0 * (1 + mx - rank) / mx).alias("pct_normed"),
    )


def value_tiers(ranked: DataFrame) -> DataFrame:
    """Quantile tier cuts per position (darko:508-524, A12). The
    reference's quantile() runs on the weekly GAM frame (``week > 0``,
    model outputs — never NA); this table-frame form EXCLUDES
    NULL-value rows (which the r9 rank fix keeps in ``ranked``) so
    ``n`` counts exactly the quantile population — R's quantile()
    would ERROR on an NA input (na.rm defaults FALSE), and a tier
    function cannot error, so drop-and-count-honestly is the declared
    boundary."""
    pop = ranked.filter(F.col("value").isNotNull())
    return pop.groupBy("position").agg(
        F.percentile("value", 0.2).alias("p20"),
        F.percentile("value", 0.5).alias("p50"),
        F.percentile("value", 0.8).alias("p80"),
        F.count("*").cast("bigint").alias("n"),
    )


def top_bottom_report(ranked: DataFrame, k: int = 5) -> DataFrame:
    """Top-k and bottom-k rows (darko:375-419, O3) with a side tag.
    NULL-value players keep a defined (bottom-of-position) pct_normed
    since the r9 rank fix, so they can surface in the bottom-k —
    matching R, whose table_df keeps them (only !is.na(current_team)
    filters, :113)."""
    w = Window.orderBy(F.col("pct_normed").desc(), F.col("player").asc())
    wrev = Window.orderBy(F.col("pct_normed").asc(), F.col("player").desc())
    top = (
        ranked.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .withColumn("side", F.lit("top"))
    )
    bottom = (
        ranked.withColumn("rn", F.row_number().over(wrev))
        .filter(F.col("rn") <= k)
        .withColumn("side", F.lit("bottom"))
    )
    return top.unionByName(bottom).select(
        "side", "rn", "player", "position", "value", "pct_normed"
    )


def gam_score_stub():
    """darko's GAM scoring (darko/2_ourlads_projections.R:123-139)
    as an Arrow-batched pandas_udf with a fixed smooth formula — the
    .rda model isn't reproducible (SURVEY §7 hard-part 5); the engine
    contract (vectorized curve applied to a panel column) is.
    """
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    # no type hints: under `from __future__ import annotations` the
    # string hints can't be resolved by pandas_udf's inspector when
    # pandas is imported function-locally
    @F.pandas_udf(T.DoubleType())
    def score(pct_normed):
        import numpy as np

        # smooth saturating curve: elite OL help more than linearly
        x = pct_normed / 100.0
        return 3.0 * np.tanh(2.5 * (x - 0.5)) + 0.8 * x

    return score


def projected_value(ranked):
    """Attach the GAM-equivalent projection to the percentile table."""
    from pyspark.sql import functions as F

    score = gam_score_stub()
    return ranked.withColumn("projected", score(F.col("pct_normed")))
