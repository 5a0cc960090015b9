"""Preseason-predictiveness pipeline — reproduction of
``R/preseason_predictiveness.R`` end-to-end.

Flow (``:6-151``): decade-column win-total tables → unpivot (R1) →
name-normalize (team_name_fn, J9) → home/away self-union of schedule
results (J7) → per-team-season actual wins → join expectations →
null audits (P10) → lm(actual_minus_expected ~ over) (A15).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.plans.pass_block import unpivot_win_totals


def team_season_wins(games: DataFrame) -> DataFrame:
    """Per-team-season wins via the home/away self-union of game
    results (R/preseason_predictiveness.R:71-78): each game yields a
    home leg (win = result>0) and an away leg (win = result<0); ties
    and unplayed games drop."""
    played = games.filter(F.col("result").isNotNull() & (F.col("result") != 0))
    home = played.select(
        "season",
        F.col("home_team").alias("team_abbr"),
        (F.col("result") > 0).cast("int").alias("win"),
    )
    away = played.select(
        "season",
        F.col("away_team").alias("team_abbr"),
        (F.col("result") < 0).cast("int").alias("win"),
    )
    return (
        home.unionByName(away)
        .groupBy("season", "team_abbr")
        .agg(F.sum("win").cast("bigint").alias("wins"),
             F.count("*").cast("bigint").alias("games_played"))
    )


def expectations_vs_actuals(
    win_totals_wide: DataFrame,
    games: DataFrame,
    year_cols: list[str],
    prefix_base: int,
) -> DataFrame:
    """Unpivot the decade-column expectations and join actual wins;
    `diff` is the over/under-performance the lm explains."""
    exp = unpivot_win_totals(win_totals_wide, year_cols, prefix_base)
    act = team_season_wins(games)
    joined = exp.join(act, ["team_abbr", "season"], "left")
    return joined.withColumn("diff", F.col("wins") - F.col("over"))


def audit_unmatched(joined: DataFrame) -> DataFrame:
    """`filter(is.na(diff))` (R/preseason_predictiveness.R:122-123):
    expectation rows with no actuals — the join-integrity audit."""
    return joined.filter(F.col("diff").isNull()).select(
        "team_abbr", "season", "over"
    )


def predictiveness_fit(joined: DataFrame) -> DataFrame:
    """lm(diff ~ over) (:150-151) via SQL regression aggregates."""
    return joined.filter(F.col("diff").isNotNull()).agg(
        F.regr_slope("diff", "over").alias("slope"),
        F.regr_intercept("diff", "over").alias("intercept"),
        F.regr_r2("diff", "over").alias("r2"),
        F.regr_count("diff", "over").alias("n"),
    )
