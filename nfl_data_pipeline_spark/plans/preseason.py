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
from nfl_data_pipeline_spark.plans.pff_grades import team_name_fn


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


def team_season_point_diff(
    games: DataFrame, max_week: int = 17
) -> DataFrame:
    """The reference's ``results`` frame
    (R/preseason_predictiveness.R:66-78): home/away self-union of
    SIGNED results over regular-season weeks (``week <= 17``,
    ``:68``), summed per team-season — POINT DIFFERENTIAL, not a win
    count. R's ``sum`` NA-propagates, so a team-season containing an
    unplayed game (NULL result) yields a NULL diff — which is exactly
    what the ``filter(is.na(diff))`` audit downstream surfaces; ties
    contribute 0 and are KEPT. The historical-abbreviation remap
    (``:79`` ``mutate_at(c("team_abbr"), nflfastR:::team_name_fn)``)
    runs AFTER the summarise exactly as in R — so an era where the
    raw schedule carries the old abbreviation (SD/OAK/STL seasons)
    aggregates under the raw key and is renamed afterwards; if a
    source ever carried both abbreviations in one season, R would
    emit two rows for the renamed key and so does this."""
    sched = games.filter(F.col("week") <= max_week)
    home = sched.select(
        "season", F.col("home_team").alias("team_abbr"), "result"
    )
    away = sched.select(
        "season",
        F.col("away_team").alias("team_abbr"),
        (-F.col("result")).alias("result"),
    )
    legs = home.unionByName(away)
    return (
        legs.groupBy("season", "team_abbr")
        .agg(
            F.when(
                F.max(F.col("result").isNull().cast("int")) == 0,
                F.sum("result"),
            ).alias("diff"),
            F.count("*").cast("bigint").alias("games_scheduled"),
        )
        .withColumn("team_abbr", team_name_fn("team_abbr"))
    )


def expectations_vs_actuals(
    win_totals_wide: DataFrame,
    games: DataFrame,
    year_cols: list[str],
    prefix_base: int,
    ps_diff: DataFrame | None = None,
) -> DataFrame:
    """The reference's ``df`` (R/preseason_predictiveness.R:113-118):
    unpivoted expectations (with the per-season ``season_wins`` =
    league-wide sum of over lines, ``:54-56``) left-joined to the
    point-differential results — ``diff`` IS the regular-season point
    differential the lm explains, not wins−over — then left-joined to
    the scraped preseason point differentials (``ps_diff``, :113-118)
    with ``ps_point_diff = as.numeric(ps_point_diff)`` (:118: PFR
    serves the column as text). ``ps_diff`` is optional because its
    source is an HTML scrape (SURVEY S9 edge); pass a frame with
    (team_abbr, season, ps_point_diff) to reproduce the full ``df``."""
    from pyspark.sql.window import Window

    exp = (
        unpivot_win_totals(win_totals_wide, year_cols, prefix_base)
        .withColumn(
            "season_wins",
            F.sum("over").over(Window.partitionBy("season")),
        )
        # :63 mutate_at(team_abbr, team_name_fn) — runs after the
        # :54-56 season_wins rollup in the reference too
        .withColumn("team_abbr", team_name_fn("team_abbr"))
    )
    act = team_season_point_diff(games)
    joined = exp.join(
        act.select("team_abbr", "season", "diff"),
        ["team_abbr", "season"],
        "left",
    )
    if ps_diff is not None:
        pd_frame = ps_diff.select(
            # :105 — every scraped per-season frame is normalized
            # before the bind/join
            team_name_fn("team_abbr").alias("team_abbr"),
            "season",
            F.col("ps_point_diff").cast("double").alias("ps_point_diff"),
        )
        joined = joined.join(pd_frame, ["team_abbr", "season"], "left")
    return joined


def audit_unmatched(joined: DataFrame) -> DataFrame:
    """`filter(is.na(diff))` (R/preseason_predictiveness.R:122-123):
    expectation rows with no (complete) actuals — join misses AND
    NA-poisoned team-seasons, the reference's join-integrity audit."""
    return joined.filter(F.col("diff").isNull()).select(
        "team_abbr", "season", "over"
    )


def predictiveness_fit(joined: DataFrame) -> DataFrame:
    """lm(diff ~ over) (:150) via SQL regression aggregates."""
    return joined.filter(F.col("diff").isNotNull()).agg(
        F.regr_slope("diff", "over").alias("slope"),
        F.regr_intercept("diff", "over").alias("intercept"),
        F.regr_r2("diff", "over").alias("r2"),
        F.regr_count("diff", "over").alias("n"),
    )


def predictiveness_fit2(joined: DataFrame) -> DataFrame:
    """lm(diff ~ over + ps_point_diff) (:151) — the two-covariate
    OLS solved in closed form from one pass of moment aggregates
    (normal equations via Cramer's rule on the centered 2×2 system);
    rows with any NULL drop like R's lm na.omit."""
    d = joined.filter(
        F.col("diff").isNotNull()
        & F.col("over").isNotNull()
        & F.col("ps_point_diff").isNotNull()
    )
    m = d.agg(
        F.count("*").cast("double").alias("n"),
        F.avg("over").alias("mx1"),
        F.avg("ps_point_diff").alias("mx2"),
        F.avg("diff").alias("my"),
        F.avg(F.col("over") * F.col("over")).alias("x1x1"),
        F.avg(F.col("over") * F.col("ps_point_diff")).alias("x1x2"),
        F.avg(F.col("ps_point_diff") * F.col("ps_point_diff")).alias("x2x2"),
        F.avg(F.col("over") * F.col("diff")).alias("x1y"),
        F.avg(F.col("ps_point_diff") * F.col("diff")).alias("x2y"),
        F.avg(F.col("diff") * F.col("diff")).alias("yy"),
    )
    s11 = F.col("x1x1") - F.col("mx1") * F.col("mx1")
    s12 = F.col("x1x2") - F.col("mx1") * F.col("mx2")
    s22 = F.col("x2x2") - F.col("mx2") * F.col("mx2")
    s1y = F.col("x1y") - F.col("mx1") * F.col("my")
    s2y = F.col("x2y") - F.col("mx2") * F.col("my")
    syy = F.col("yy") - F.col("my") * F.col("my")
    det = s11 * s22 - s12 * s12
    b1 = (s22 * s1y - s12 * s2y) / det
    b2 = (s11 * s2y - s12 * s1y) / det
    return m.select(
        b1.alias("beta_over"),
        b2.alias("beta_ps_point_diff"),
        (F.col("my") - b1 * F.col("mx1") - b2 * F.col("mx2")).alias(
            "intercept"
        ),
        ((b1 * s1y + b2 * s2y) / syy).alias("r2"),
        F.col("n").cast("bigint").alias("n"),
    )
