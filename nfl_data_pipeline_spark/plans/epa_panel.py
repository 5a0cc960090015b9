"""QB-season panel with lag structure — reproduction of the core of
``R/epa_predict.R`` (the reference's heaviest analysis).

Moves: filtered QB-season aggregation (``:171-214``), playcaller
mode + change flag (``:26-57``), multi-source left joins (``:215-219``),
the 13-column lag panel by entity ordered by season (``:241-261``),
join-integrity audits (``:229-238``), and the correlation table
(``:270-292``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nfl_data_pipeline_spark.functions import clamp, r_mean
from nfl_data_pipeline_spark.operators.relational import top1_per_group

# The metrics lagged by QB across seasons — the reference's 13-column
# lag block (R/epa_predict.R:241-261), one per panel measure.
LAG_METRICS = [
    "epa_play",
    "cpoe",
    "success_rate",
    "qbr_total",
    "yards",
    "ints",
    "pass_tds",
    "n_plays",
]


def qb_seasons(pbp: DataFrame, min_plays: int = 50) -> DataFrame:
    """Per-QB-season aggregates (R/epa_predict.R:171-214): dropback/
    rush plays, REG season, epa clamped at -4.5 (:197-200), cpoe with
    na.rm=TRUE vs plays strict (A3 both forms).
    """
    plays = pbp.filter(
        ((F.col("pass") == 1) | (F.col("rush") == 1))
        & F.col("epa").isNotNull()
        & (F.col("season_type") == "REG")
        & F.col("id").isNotNull()
    ).withColumn("epa_c", clamp("qb_epa", -4.5, 1e9))
    wname = Window.partitionBy("id", "season").orderBy("game_id", "play_id")
    named = plays.withColumn(
        "qb_name", F.first("name").over(wname)  # ordered first (A5)
    )
    return (
        named.groupBy("id", "season")
        .agg(
            F.first("qb_name").alias("name"),
            F.max("posteam").alias("posteam"),
            F.count("*").cast("bigint").alias("n_plays"),
            F.avg("epa_c").alias("epa_play"),
            r_mean("cpoe", na_rm=True).alias("cpoe"),
            F.sum("yards_gained").alias("yards"),
            F.sum("interception").cast("bigint").alias("ints"),
            F.sum("pass_touchdown").cast("bigint").alias("pass_tds"),
            F.avg("success").alias("success_rate"),
        )
        .filter(F.col("n_plays") >= min_plays)
    )


def playcaller_mode(playcallers: DataFrame) -> DataFrame:
    """Most-frequent playcaller per team-season then change flag via
    lag (R/epa_predict.R:26-57, W3 + W11)."""
    counts = playcallers.groupBy("season", "posteam", "off_play_caller").agg(
        F.count("*").alias("n")
    )
    mode = top1_per_group(
        counts,
        ["season", "posteam"],
        [F.col("n").desc(), F.col("off_play_caller").asc()],
    )
    w = Window.partitionBy("posteam").orderBy("season")
    return mode.withColumn(
        "new_pc",
        F.when(
            F.col("off_play_caller") != F.lag("off_play_caller", 1).over(w), 1
        ).otherwise(0),
    ).select("season", "posteam", "off_play_caller", "new_pc")


def build_panel(
    pbp: DataFrame, qbr: DataFrame, playcallers: DataFrame
) -> DataFrame:
    """The chained multi-source join panel (J3: R/epa_predict.R:215-219)
    + lag columns by QB ordered by season (W1: :241-261)."""
    base = qb_seasons(pbp)
    q = qbr.select(
        "season",
        F.col("team").alias("posteam"),
        F.concat(
            F.substring("name_first", 1, 1), F.lit("."), F.col("name_last")
        ).alias("name"),  # name build (J9 normalization: :96-103)
        "qb_plays",
        "qbr_total",
    )
    pc = playcaller_mode(playcallers)
    panel = base.join(q, ["season", "posteam", "name"], "left").join(
        F.broadcast(pc), ["season", "posteam"], "left"
    )
    w = Window.partitionBy("id").orderBy("season")
    for c in LAG_METRICS:
        panel = panel.withColumn(f"lag_{c}", F.lag(c, 1).over(w))
    return panel


def qbr_audit(panel: DataFrame) -> DataFrame:
    """Join-integrity audit (P10: R/epa_predict.R:229-238) — QB-seasons
    that failed to match a QBR row. Non-empty is expected on the
    fixture (one season deliberately missing)."""
    return panel.filter(F.col("qbr_total").isNull()).select(
        "season", "posteam", "name", "n_plays"
    )


def stability_corrs(panel: DataFrame) -> DataFrame:
    """Year-over-year stability correlation table (A11:
    R/epa_predict.R:270-292 — the full metric × lag grid, the
    reference's 26-cell table generalized): one long row per metric
    with its self-lag correlation and pairwise-complete n."""
    rows = [
        panel.agg(
            F.lit(c).alias("metric"),
            F.corr(c, f"lag_{c}").alias("yoy_corr"),
            F.count(
                F.when(
                    F.col(c).isNotNull() & F.col(f"lag_{c}").isNotNull(), 1
                )
            )
            .cast("bigint")
            .alias("n_pairs"),
        )
        for c in LAG_METRICS
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cross_corrs(panel: DataFrame, target: str = "epa_play") -> DataFrame:
    """Which of LAST season's metrics predicts THIS season's target —
    the predictive half of the reference's grid
    (R/epa_predict.R:270-292 columns vs next-year epa)."""
    return panel.agg(
        *[
            F.corr(target, f"lag_{c}").alias(f"cor_{c}")
            for c in LAG_METRICS
        ]
    )
