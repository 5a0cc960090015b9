"""Team pass-rate gauges — reproduction of ``R/let_russ_cook.R``.

Reference lifecycle (SURVEY.md §3.3): lazy filter/select pushed into
SQLite (``:40-44``), then eager grouped means (``:104-107``) and a
0-100 gauge rescale (``:112-121``), repeated per week (``:197-216``).
Here the whole thing is one Catalyst plan per output.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nfl_data_pipeline_spark.functions import r_mean


def neutral_plays(pbp: DataFrame, season: int | None = None) -> DataFrame:
    """The canonical neutral-situation filter stack
    (R/let_russ_cook.R:41-43): early downs, WP 20-80%, >2min left in
    half, non-null epa/posteam. All predicates reach the parquet scan."""
    df = pbp.filter(
        ((F.col("down") == 1) | (F.col("down") == 2))
        & F.col("wp").between(0.2, 0.8)
        & (F.col("half_seconds_remaining") > 120)
        & F.col("epa").isNotNull()
        & F.col("posteam").isNotNull()
    )
    if season is not None:
        df = df.filter(F.col("season") == season)
    return df.select("posteam", "defteam", "rush", "pass", "week", "season")


def team_pass_rates(pbp: DataFrame, season: int | None = None) -> DataFrame:
    """Grouped mean pass rate + 0-100 gauge position
    (R/let_russ_cook.R:104-121)."""
    rates = (
        neutral_plays(pbp, season)
        .groupBy("posteam")
        .agg(
            # :106 p = mean(pass) — R's STRICT default (no na.rm); one NA
            # pass indicator NAs the team's rate (r9 fix: F.avg skips)
            r_mean("pass").alias("pass_rate"),
            F.count("*").cast("bigint").alias("n_plays"),
        )
    )
    w = Window.partitionBy()
    lo = F.min("pass_rate").over(w)
    hi = F.max("pass_rate").over(w)
    # :108-110 min/max have no na.rm: ONE team with a strict-NA rate
    # NAs every gauge in R (min(teams$p) → NA → pct NA for all),
    # where SQL MIN/MAX would skip the null — same class as the
    # grouped_rescale strict fix (r9)
    any_null = F.max(F.col("pass_rate").isNull().cast("int")).over(w)
    out = rates.withColumn(
        "gauge",
        F.when(
            any_null == 0,
            100.0 * (F.col("pass_rate") - lo) / (hi - lo),
        ),
    )
    # gauge needle geometry (R/let_russ_cook.R:48-62 cos/sin — the
    # §2.9 trig family): angle sweeps π (left, gauge=0) → 0 (right)
    theta = (1.0 - F.col("gauge") / 100.0) * math.pi
    return out.withColumn("needle_x", F.cos(theta)).withColumn(
        "needle_y", F.sin(theta)
    )


def weekly_pass_rates(
    pbp: DataFrame, team: str, season: int | None = None
) -> DataFrame:
    """The per-week facet re-run (R/let_russ_cook.R:197-216) — one
    grouped agg instead of a loop of collect()s. Each facet carries
    the FULL get_figure computation for its week, not just the focal
    team's rate: the reference recomputes the all-team rescale inside
    every weekly call (``:104-121`` via ``:205-207``), so ``gauge``
    is the team's 0-100 position among that week's team means and the
    needle geometry follows it (``:48-62``). ``opponent`` is the
    facet title's ``first(sea_data$defteam)`` (``:155``) — one
    opponent per team-week, so first = min made explicit (SURVEY §7
    order fix)."""
    plays = neutral_plays(pbp, season)
    weekly = plays.groupBy("week", "posteam").agg(
        r_mean("pass").alias("pass_rate"),  # strict, as :106 (r9)
        F.count("*").cast("bigint").alias("n_plays"),
    )
    w = Window.partitionBy("week")
    lo = F.min("pass_rate").over(w)
    hi = F.max("pass_rate").over(w)
    # strict min/max per week, as in team_pass_rates (r9)
    any_null = F.max(F.col("pass_rate").isNull().cast("int")).over(w)
    scaled = weekly.withColumn(
        "gauge",
        F.when(
            any_null == 0,
            100.0 * (F.col("pass_rate") - lo) / (hi - lo),
        ),
    )
    theta = (1.0 - F.col("gauge") / 100.0) * math.pi
    opp = (
        plays.filter(F.col("posteam") == team)
        .groupBy("week")
        .agg(F.min("defteam").alias("opponent"))
    )
    return (
        scaled.filter(F.col("posteam") == team)
        .withColumn("needle_x", F.cos(theta))
        .withColumn("needle_y", F.sin(theta))
        .join(opp, "week")
        .select(
            "week",
            "pass_rate",
            "n_plays",
            "gauge",
            "needle_x",
            "needle_y",
            "opponent",
        )
        .orderBy("week")
    )


def qbr_per_team(qbr_raw: DataFrame) -> DataFrame:
    """The reference's ``qbr`` frame (R/let_russ_cook.R:17-34): one
    QB per team from the season QBR table — glue name build
    ``{substr(first_name,1,1)}.{last_name}`` (NA pieces render as the
    literal "NA"), the ``D.Haskins Jr.`` hand-repair (:21-24),
    per-NAME total plays (``tot_n = sum(qb_plays)`` — strict, R's
    no-na.rm sum), the LAR→LA recode (:28), then per-team
    ``arrange(-tot_n) %>% slice(1)`` (:29-31 — R sorts NA tot_n last
    and slice keeps the first in frame order; the tie/NA order is
    made explicit with a name tiebreak and nulls-last, SURVEY §7).
    The HTTP fetch (espnscrapeR) is an S8 edge — this takes the
    fetched frame."""
    from pyspark.sql.window import Window

    name = F.concat(
        F.coalesce(F.substring(F.col("first_name"), 1, 1), F.lit("NA")),
        F.lit("."),
        F.coalesce(F.col("last_name"), F.lit("NA")),
    )
    named = qbr_raw.withColumn("name", name).withColumn(
        "name",
        F.when(F.col("name") == "D.Haskins Jr.", "D.Haskins").otherwise(
            F.col("name")
        ),
    )
    wn = Window.partitionBy("name")
    # strict window sum (r_sum's contract over a window frame): one
    # NULL qb_plays row NAs the whole name's tot_n like R's sum()
    any_null = F.max(F.col("qb_plays").isNull().cast("int")).over(wn)
    built = named.withColumn(
        "tot_n", F.when(any_null == 0, F.sum("qb_plays").over(wn))
    ).withColumn(
        "team",
        F.when(F.col("team") == "LAR", "LA").otherwise(F.col("team")),
    )
    w = Window.partitionBy("team").orderBy(
        F.col("tot_n").desc_nulls_last(), F.col("name").asc()
    )
    return (
        built.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("name", "first_name", "team", "qbr_total", "headshot_href")
    )
