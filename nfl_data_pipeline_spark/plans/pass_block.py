"""Pass-block grade panels — reproduction of
``pff/99_passblock_piece.R`` + ``R/preseason_predictiveness.R``'s
reshape/fit moves, over generic grade/win-total inputs.

Moves: per-season min-max rescale windows (``99_passblock:43-68``),
full_join of panels (``:71``), top-snap player dedup (``:220-226``),
year-over-year lag stability (``:206-216,234-241``), decade-column
unpivot (``preseason:18-21``), and the lm fit (``preseason:150-151``)
via SQL regression aggregates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nfl_data_pipeline_spark.operators.relational import (
    grouped_rescale,
    top1_per_group,
)


def rescaled_team_grades(team_grades: DataFrame, cols: list[str]) -> DataFrame:
    """Per-season 0-100 rescale of each grade column
    (pff/99_passblock_piece.R:43-68)."""
    out = team_grades
    for c in cols:
        out = grouped_rescale(out, ["season"], c, f"{c}_scaled")
    return out


def join_grade_panels(a: DataFrame, b: DataFrame) -> DataFrame:
    """full_join(pff, by=c('season','posteam')) — J4 (:71)."""
    return a.join(b, ["season", "team_abbr"], "full_outer")


def top_snap_players(player_grades: DataFrame, min_snaps: int = 400) -> DataFrame:
    """Snap filter + one row per player-season (top snaps)
    (pff/99_passblock_piece.R:220-226)."""
    eligible = player_grades.filter(F.col("snap_counts_pass_play") >= min_snaps)
    return top1_per_group(
        eligible,
        ["player_id", "season"],
        [F.col("snap_counts_pass_play").desc(), F.col("team_abbr").asc()],
    )


def grade_stability(player_grades: DataFrame, grade_col: str) -> DataFrame:
    """Year-over-year lag + same-team/changed-team split correlation
    (pff/99_passblock_piece.R:206-216,248-253)."""
    w = Window.partitionBy("player_id").orderBy("season")
    lagged = (
        player_grades.withColumn("lag_grade", F.lag(grade_col, 1).over(w))
        .withColumn("lag_team", F.lag("team_abbr", 1).over(w))
        .filter(F.col("lag_grade").isNotNull())
        .withColumn(
            "same_team",
            (F.col("team_abbr") == F.col("lag_team")).cast("int"),
        )
    )
    return lagged.groupBy("same_team").agg(
        F.count("*").cast("bigint").alias("n"),
        F.corr(grade_col, "lag_grade").alias("yoy_corr"),
    )


def unpivot_win_totals(wide: DataFrame, year_cols: list[str], prefix_base: int) -> DataFrame:
    """pivot_longer(x00:x09) decade columns → (team, season, over)
    (R/preseason_predictiveness.R:18-21)."""
    long = wide.unpivot(
        ids=["team_abbr"],
        values=year_cols,
        variableColumnName="year_col",
        valueColumnName="over",
    )
    return long.withColumn(
        "season",
        (
            F.lit(prefix_base)
            + F.regexp_replace("year_col", "[^0-9]", "").cast("int")
        ),
    ).drop("year_col")


def preseason_fit(joined: DataFrame) -> DataFrame:
    """lm(diff ~ over) (R/preseason_predictiveness.R:150-151) as SQL
    regression aggregates (A15)."""
    return joined.agg(
        F.regr_slope("diff", "over").alias("slope"),
        F.regr_intercept("diff", "over").alias("intercept"),
        F.regr_r2("diff", "over").alias("r2"),
        F.regr_count("diff", "over").alias("n"),
    )
