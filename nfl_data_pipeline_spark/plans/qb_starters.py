"""Starting-QB history table — reproduction of
``R/nfc_west_starting_qbs.R``.

Moves: first pass-play per (game, team) dedup via ordered slice(1)
(``:17-20,24-27`` — the reference trusts file order; we order by
play_id), roster join on passer id (``:36``), first-start date per QB
(``:30``), and the 4-team positional column layout with padding
(``:69-94`` → row-number full-outer join, J8/R6).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.relational import (
    bind_cols_by_rownum,
    top1_per_group,
)


def game_starters(pbp: DataFrame, roster: DataFrame, teams: list[str]) -> DataFrame:
    """First pass play of each game per team = that game's starter
    (R/nfc_west_starting_qbs.R:23-31), joined to roster names."""
    passes = pbp.filter(
        F.col("posteam").isin(teams) & F.col("passer_player_id").isNotNull()
    )
    first_pass = top1_per_group(
        passes, ["game_id", "posteam"], [F.col("play_id").asc()]
    ).select(
        "game_id",
        "game_date",
        "season",
        "posteam",
        "passer_player_name",
        "passer_player_id",
    )
    # roster deduped by gsis_id (slice(1) — :17-20), explicit order
    r1 = top1_per_group(roster, ["gsis_id"], [F.col("season").asc()]).select(
        F.col("gsis_id"), F.col("full_name")
    )
    return first_pass.join(
        F.broadcast(r1), first_pass.passer_player_id == r1.gsis_id, "left"
    ).drop("gsis_id")


def starter_summary(starters: DataFrame) -> DataFrame:
    """Per team+QB: games started, first start date (ordered first,
    A5 — :30)."""
    return (
        starters.groupBy("posteam", "passer_player_id", "passer_player_name")
        .agg(
            F.count("*").cast("bigint").alias("n_starts"),
            F.min("game_date").alias("first_start"),
            F.max("game_date").alias("last_start"),
        )
    )


def four_team_layout(starters: DataFrame, teams: list[str]) -> DataFrame:
    """The presentation table: one column block per team, positionally
    aligned and padded (R/nfc_west_starting_qbs.R:69-94)."""
    blocks = []
    for t in teams:
        blocks.append(
            starters.filter(F.col("posteam") == t).select(
                F.col("game_date").alias(f"date_{t}"),
                F.col("passer_player_name").alias(f"qb_{t}"),
            )
        )
    return reduce(
        lambda left, right: bind_cols_by_rownum(
            left,
            right,
            [F.col(left.columns[0])],
            [F.col(right.columns[0])],
        ).drop("row_num"),
        blocks,
    )
