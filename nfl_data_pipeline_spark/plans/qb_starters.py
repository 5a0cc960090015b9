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

from nfl_data_pipeline_spark.operators.relational import top1_per_group


def game_starters(pbp: DataFrame, roster: DataFrame, teams: list[str]) -> DataFrame:
    """First pass play of each game per team = that game's starter
    (R/nfc_west_starting_qbs.R:23-31), joined to roster names."""
    # :24 filter(!is.na(passer_player_name)) — the reference gates on
    # the NAME, not the id (r9 fix: a named passer with a missing id
    # is a starter row whose roster join comes back NULL, exactly as
    # R's decode/left_join would produce)
    passes = pbp.filter(
        F.col("posteam").isin(teams)
        & F.col("passer_player_name").isNotNull()
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
        starters.groupBy(
            "posteam", "passer_player_id", "passer_player_name", "full_name"
        )
        .agg(
            F.count("*").cast("bigint").alias("n_starts"),
            F.min("game_date").alias("first_start"),
            F.max("game_date").alias("last_start"),
        )
    )


def four_team_layout(
    starters: DataFrame,
    teams: list[str],
    extra_rows: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """The presentation table (R/nfc_west_starting_qbs.R:39-94): one
    column per team holding that team's DISTINCT starting QBs in
    first-start order — the reference summarizes per-game starters to
    one row per QB (``:28-33`` summarize + ``arrange(posteam,
    first)``) BEFORE the column hack, so each cell is the ROSTER
    ``full_name`` (``:36-37`` select after the roster join — r9 fix:
    previously the abbreviated passer name). ``extra_rows`` is the
    reference's hand-append repair (``:55-61`` "delete this after
    Wolford appears in the data": a literal name bound to the BOTTOM
    of one team's column before padding). Positional bind with the
    reference's single-space padding (``:69-94`` ``rep(" ",
    max - nrow)``); within-date order made explicit by name (§7
    order fix)."""
    from pyspark.sql.window import Window

    summary = starter_summary(starters)
    indexed = []
    for t in teams:
        w = Window.orderBy("first_start", "passer_player_name")
        col = (
            summary.filter(F.col("posteam") == t)
            .withColumn("__rn", F.row_number().over(w))
            .select("__rn", F.col("full_name").alias(f"qb_{t}"))
        )
        extra = (extra_rows or {}).get(t)
        if extra:
            spark = starters.sparkSession
            mx = col.agg(
                F.coalesce(F.max("__rn"), F.lit(0)).alias("_mx")
            )
            extras_df = (
                spark.createDataFrame(
                    [(i + 1, nm) for i, nm in enumerate(extra)],
                    f"__off int, qb_{t} string",
                )
                .crossJoin(mx)
                .select(
                    (F.col("_mx") + F.col("__off")).alias("__rn"),
                    f"qb_{t}",
                )
            )
            col = col.unionByName(extras_df)
        indexed.append(col)
    bound = reduce(
        lambda left, right: left.join(right, "__rn", "full_outer"),
        indexed,
    )
    # reference pads short columns with " " rather than NULL (:72-88)
    return bound.orderBy("__rn").select(
        *[
            F.coalesce(F.col(f"qb_{t}"), F.lit(" ")).alias(f"qb_{t}")
            for t in teams
        ]
    )
