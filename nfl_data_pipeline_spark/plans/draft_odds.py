"""Draft-odds de-vig + pivot — reproduction of
``R/nfl_draft_espn_dk.R``.

Moves: name/label parsing (``:14-19``), American-odds → implied
probability (``:21-26``), the 10-iteration vig-removal fixed point
per (player, line) book (``:28-40``), pivot_wider on the under/over
flag (``:42-45``), and the cumulative-probability CDF (``:75-81``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nfl_data_pipeline_spark.functions import american_odds_to_prob


def parse_odds(dk: DataFrame) -> DataFrame:
    """String cleanup + implied probability
    (R/nfl_draft_espn_dk.R:13-26). ``pick`` is DERIVED from the
    outcome label — ``str_remove(pick, "(Under )|(Over )")`` then
    as.numeric (:19-20) — not read from a source column (r9
    provenance fix: the fixture happens to carry a numeric pick, but
    the reference's frame only has the label)."""
    return dk.select(
        F.regexp_replace("player", " Draft Position$", "").alias("player"),
        F.regexp_replace("label", "(Under )|(Over )", "")
        .cast("double")
        .alias("pick"),
        F.when(F.col("label").contains("Under"), 1).otherwise(0).alias("under"),
        F.col("oddsAmerican").cast("double").alias("odds"),
    ).withColumn("pct", american_odds_to_prob("odds"))


def remove_vig(parsed: DataFrame, n_iter: int = 10) -> DataFrame:
    """Power-method de-vig (R/nfl_draft_espn_dk.R:28-40):
    pct ← pct^(log2/log(2/Σpct)). The reference normalizes per
    PLAYER (``group_by(player)``, ``:33``) — one Over/Under line per
    player in this market, so the player group IS the 2-leg book;
    kept player-only for exact parity."""
    w = Window.partitionBy("player")
    df = parsed
    for i in range(n_iter):
        k = F.log(F.lit(2.0)) / F.log(2.0 / F.sum("pct").over(w))
        df = df.withColumn("pct", F.pow("pct", k))
        if i % 4 == 3:
            df = df.localCheckpoint(eager=False)
    return df


def pivot_under_over(devigged: DataFrame) -> DataFrame:
    """pivot_wider(values_from=c(odds,pct), names_from=under) + the
    reference's select (R/nfl_draft_espn_dk.R:42-45): exactly
    (player, pick_dk, odds_under, odds_over, pct_under), arranged by
    pick_dk — pct_0 (the over-side devigged probability) is pivoted
    but DROPPED by the select, and the line is renamed pick_dk, both
    reproduced here (r10 parity fix: pct_over previously survived)."""
    piv = (
        devigged.groupBy("player", "pick")
        .pivot("under", [0, 1])
        .agg(F.first("odds").alias("odds"), F.first("pct").alias("pct"))
    )
    return piv.select(
        "player",
        F.col("pick").alias("pick_dk"),
        F.col("1_odds").alias("odds_under"),
        F.col("0_odds").alias("odds_over"),
        F.col("1_pct").alias("pct_under"),
    ).orderBy("pick_dk")


def pick_cdf(espn_proj: DataFrame) -> DataFrame:
    """Per-player cumulative pick probability ordered by pick number
    (R/nfl_draft_espn_dk.R:75-81) — running sum, explicit order."""
    w = (
        Window.partitionBy("player")
        .orderBy("espn_pick")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return espn_proj.withColumn("cum_prob", F.sum("espn_prob").over(w))


def join_espn_dk(espn_proj: DataFrame, dk_wide: DataFrame) -> DataFrame:
    """The ``full`` frame (R/nfl_draft_espn_dk.R:75-83): ESPN pick
    distribution left-joined to the de-vigged DK lines, per-player
    cumulative ESPN probability (explicit espn_pick order), both
    probabilities ×100, then the one row per player where the ESPN
    pick sits just under the DK line (``espn_pick == pick_dk − 0.5``
    — DK lines are half-integers)."""
    cdf = pick_cdf(espn_proj).withColumnsRenamed({"cum_prob": "tot_espn"})
    # dk_wide arrives with the reference's post-pivot column set —
    # pick_dk already named by pivot_under_over's select
    joined = cdf.join(dk_wide, "player", "left")
    return (
        joined.withColumn("pct_under", 100.0 * F.col("pct_under"))
        .withColumn("tot_espn", 100.0 * F.col("tot_espn"))
        .filter(F.col("espn_pick") == F.col("pick_dk") - 0.5)
    )


def edge_table(full: DataFrame) -> DataFrame:
    """The ``t`` display frame (R/nfl_draft_espn_dk.R:85-90):
    DK-vs-ESPN before-the-line probabilities and their difference,
    biggest ESPN-over-DK edge first (tiebreak made explicit)."""
    return (
        full.select(
            "player",
            "pos",
            F.col("pick_dk").alias("line"),
            F.col("pct_under").alias("before_dk"),
            F.col("tot_espn").alias("before_espn"),
        )
        .withColumn("diff", F.col("before_espn") - F.col("before_dk"))
        .orderBy(F.desc("diff"), F.asc("player"))
    )


def kelly_bets(full: DataFrame) -> DataFrame:
    """The bet-sizing block (R/nfl_draft_espn_dk.R:168-210): Kelly
    stake per line with ESPN's CDF as the true probability — unders
    where ESPN's before-line mass exceeds DK's (``:170``), overs
    otherwise (``:189``); ``risked = 1000·(p + (p−1)/b)`` with the
    side's net decimal odds ``b``, kept only when positive, largest
    stake first. One tagged frame instead of two padded bind_cols
    halves. Reference wart reproduced on purpose: only the OVER leg
    branches ``b``/``to_win`` on the American odds sign
    (``:192-201``); the under leg hardcodes the negative-odds
    formulas (``:172-176`` — draft unders are always minus-priced in
    this market), so a plus-priced under would mis-stake in the
    reference and does here too."""
    under = (
        full.filter(F.col("pct_under") < F.col("tot_espn"))
        .withColumn("p", F.col("tot_espn") / 100.0)
        .withColumn("b", 100.0 / F.abs(F.col("odds_under")))
        .withColumn(
            "risked",
            1000.0 * (F.col("p") + (F.col("p") - 1.0) / F.col("b")),
        )
        .withColumn(
            "to_win", 100.0 * F.col("risked") / F.abs(F.col("odds_under"))
        )
        .withColumn("side", F.lit("under"))
        .withColumn("price", F.col("odds_under"))
    )
    over = (
        full.filter(F.col("pct_under") >= F.col("tot_espn"))
        .withColumn("p", 1.0 - F.col("tot_espn") / 100.0)
        .withColumn(
            "b",
            F.when(
                F.col("odds_over") > 0, F.abs(F.col("odds_over")) / 100.0
            ).otherwise(100.0 / F.abs(F.col("odds_over"))),
        )
        .withColumn(
            "risked",
            1000.0 * (F.col("p") + (F.col("p") - 1.0) / F.col("b")),
        )
        .withColumn(
            "to_win",
            F.when(
                F.col("odds_over") < 0,
                100.0 * F.col("risked") / F.abs(F.col("odds_over")),
            ).otherwise(F.col("risked") * F.col("odds_over") / 100.0),
        )
        .withColumn("side", F.lit("over"))
        .withColumn("price", F.col("odds_over"))
    )
    return (
        under.unionByName(over)
        .filter(F.col("risked") > 0)
        .select(
            "side",
            "player",
            "pos",
            F.col("pick_dk").alias("pick"),
            "price",
            "risked",
            "to_win",
        )
        .orderBy(F.desc("risked"), F.asc("player"))
    )


def split_two_column(
    t: DataFrame,
    order_by: list,
    n_left: int = 24,
) -> DataFrame:
    """The gt two-column presentation bind
    (R/nfl_draft_espn_dk.R:105-110, repeated at :213-217): rows
    1..n_left of the ordered table beside rows n_left+1.., the right
    half padded with the reference's blank row (strings " ",
    numerics NULL) up to n_left. bind_cols suffixes duplicate names;
    here the halves carry explicit _l/_r suffixes (declared rename).
    ``order_by`` makes the reference's frame order explicit
    (edge_table arrives arranged by -diff)."""
    from pyspark.sql.window import Window

    w = Window.orderBy(*order_by)
    idx = t.withColumn("__rn", F.row_number().over(w))
    left = idx.filter(F.col("__rn") <= n_left).select(
        "__rn", *[F.col(c).alias(f"{c}_l") for c in t.columns]
    )
    right = idx.filter(F.col("__rn") > n_left).select(
        (F.col("__rn") - n_left).alias("__rn"),
        *[F.col(c).alias(f"{c}_r") for c in t.columns],
    )
    out = left.join(right, "__rn", "left")
    pads = []
    for c, dt in t.dtypes:
        col = F.col(f"{c}_r")
        if dt == "string":
            col = F.coalesce(col, F.lit(" "))
        pads.append(col.alias(f"{c}_r"))
    return out.orderBy("__rn").select(
        *[f"{c}_l" for c in t.columns], *pads
    )
