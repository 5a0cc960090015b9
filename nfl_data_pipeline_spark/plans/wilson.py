"""Grouped-cumsum 'game over' analysis — reproduction of
``R/wilson_game_pass_freq.R``.

The signature move (``:22-37``): per game, in play order, a running
sum of a condition becomes a sticky state flag (`over =
if_else(cumsum(under_wp) > 0, 1, 0)`), then per-game pass-rate
summaries split by the flag. The reference relies on frame row order;
we order by (game_id, play_id) explicitly (SURVEY §7 hard-part 1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def with_game_over_flag(
    pbp: DataFrame, team: str, wp_floor: float = 0.20
) -> DataFrame:
    """`under_wp = wp < floor`; `over = cumsum(under_wp) > 0` per game
    in play order (R/wilson_game_pass_freq.R:22-37)."""
    plays = pbp.filter(
        (F.col("posteam") == team)
        & F.col("down").isNotNull()
        & F.col("epa").isNotNull()
    )
    w = (
        Window.partitionBy("game_id")
        .orderBy("play_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    under = F.when(F.col("wp") < wp_floor, 1).otherwise(0)
    return plays.withColumn(
        "game_over", F.when(F.sum(under).over(w) > 0, 1).otherwise(0)
    )


def per_game_summary(pbp: DataFrame, team: str) -> DataFrame:
    """Per-game pass rates before/after the game went 'over'
    (R/wilson_game_pass_freq.R:41-45), with first(game_date) over the
    explicit play order (A5)."""
    flagged = with_game_over_flag(pbp, team)
    wdate = (
        Window.partitionBy("game_id")
        .orderBy("play_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        flagged.withColumn("game_date_first", F.first("game_date").over(wdate))
        .groupBy("game_id", "game_date_first")
        .agg(
            F.count("*").cast("bigint").alias("n_plays"),
            F.avg(F.when(F.col("game_over") == 0, F.col("pass"))).alias(
                "pass_rate_alive"
            ),
            F.avg(F.when(F.col("game_over") == 1, F.col("pass"))).alias(
                "pass_rate_over"
            ),
            F.sum("game_over").cast("bigint").alias("n_plays_over"),
        )
        .withColumnRenamed("game_date_first", "game_date")
    )
