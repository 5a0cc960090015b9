"""Pass rate over expected — reproduction of
``R/pass_rate_over_expected.R``.

``nflfastR::add_xpass()`` (U2) appends a modeled pass probability from
situation features; ``pass_oe = 100*(pass - xpass)`` (``:20-24``); team
aggregates join the broadcast teams dim (``:25-38``). The model here is
a fixed-coefficient logistic (the engine contract — vectorized
situational scoring — not nflfastR's fitted weights; SURVEY §7
hard-part 5).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

# situation → pass-probability coefficients (stand-in artifact)
_COEF = {
    "b0": -0.35,
    "down2": 0.25,
    "down3": 1.10,
    "down4": 0.90,
    "ydstogo": 0.065,
    "half_seconds": -0.00035,
    "wp_dist": -1.2,  # |wp - 0.5|: trailing/leading teams diverge
}


def _make_xpass():
    @F.pandas_udf(T.DoubleType())
    def xpass(
        down: pd.Series, ydstogo: pd.Series, half_seconds: pd.Series, wp: pd.Series
    ) -> pd.Series:
        import numpy as np

        c = _COEF
        z = (
            c["b0"]
            + c["down2"] * (down == 2)
            + c["down3"] * (down == 3)
            + c["down4"] * (down == 4)
            + c["ydstogo"] * ydstogo
            + c["half_seconds"] * half_seconds
            + c["wp_dist"] * (wp - 0.5).abs()
        )
        return 1.0 / (1.0 + np.exp(-z))

    return xpass


def add_xpass(pbp: DataFrame) -> DataFrame:
    """Score every play with expected pass probability + pass_oe
    (R/pass_rate_over_expected.R:16-24)."""
    plays = pbp.filter(
        F.col("down").isNotNull()
        & F.col("posteam").isNotNull()
        & ((F.col("pass") == 1) | (F.col("rush") == 1))
    )
    xp = _make_xpass()
    scored = plays.withColumn(
        "xpass", xp("down", "ydstogo", "half_seconds_remaining", "wp")
    )
    return scored.withColumn(
        "pass_oe", 100.0 * (F.col("pass") - F.col("xpass"))
    )


def team_pass_oe(pbp: DataFrame, teams: DataFrame) -> DataFrame:
    """Team aggregates joined to the broadcast 32-row dim (J5:
    R/pass_rate_over_expected.R:25-38)."""
    scored = add_xpass(pbp)
    agg = scored.groupBy("posteam").agg(
        F.count("*").cast("bigint").alias("n_plays"),
        F.avg("pass").alias("pass_rate"),
        F.avg("xpass").alias("exp_pass_rate"),
        F.avg("pass_oe").alias("pass_oe"),
    )
    return agg.join(
        F.broadcast(teams.select("team_abbr", "team_name", "team_color")),
        agg.posteam == F.col("team_abbr"),
        "left",
    ).drop("team_abbr")
