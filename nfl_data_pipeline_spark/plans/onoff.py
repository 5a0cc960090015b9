"""Player on/off-field splits — reproduction of ``R/on_off_nflreadr.R``.

The reference (``:30-34``) tests membership with
``str_detect(offense_players, pid)`` — substring matching over the
';'-joined id list — and runs 8 near-identical grouped-agg blocks
(``:59-89``). Here: exact membership via split + array_contains (the
substring form has prefix-collision false positives — the reference's
latent bug, noted in SURVEY §2 P8), and ONE aggregation over an
on/off × pass/rush dimension grid.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_on_off(participation: DataFrame, gsis_id: str, team: str) -> DataFrame:
    """Tag each team snap with on/off for the player."""
    snaps = participation.filter(
        (F.col("posteam") == team) & F.col("epa").isNotNull()
    )
    on = F.array_contains(F.split("offense_players", ";"), gsis_id)
    return snaps.withColumn("on_field", F.when(on, "on").otherwise("off"))


def on_off_summary(
    participation: DataFrame, gsis_id: str, team: str
) -> DataFrame:
    """The 8 summarize blocks of R/on_off_nflreadr.R:59-89 as one
    grouped aggregation over (on_field, play_kind)."""
    tagged = split_on_off(participation, gsis_id, team)
    kind = F.when(F.col("pass") == 1, "pass").otherwise("rush")
    return (
        tagged.withColumn("play_kind", kind)
        .groupBy("on_field", "play_kind")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.avg("epa").alias("epa_play"),
            F.avg("success").alias("success_rate"),
            F.avg("first_down").alias("first_down_rate"),
        )
    )


def on_off_overall(
    participation: DataFrame, gsis_id: str, team: str
) -> DataFrame:
    """Overall on/off split incl. pass rate (the `mean(pass)` rows of
    the reference's blocks), with display rounding à la `:92`
    (bround = R's round)."""
    tagged = split_on_off(participation, gsis_id, team)
    return tagged.groupBy("on_field").agg(
        F.count("*").cast("bigint").alias("n"),
        F.bround(F.avg("epa"), 2).alias("epa_play"),
        F.avg("pass").alias("pass_rate"),
        F.avg("success").alias("success_rate"),
    )
