"""Win-probability calibration + log-loss — reproduction of
``R/espn_wp.R``.

Pipeline (``:36-99,236-274``): ESPN per-play WP (string play ids) →
lag to align pre-play WP (W2) → drop each game's first sample (W5) →
join games on espn id (J1) → join pbp on (game_id, play_id) (J2) →
label = home win → calibration bins per quarter (A14) → log-loss
slices (A13).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nfl_data_pipeline_spark.functions import log_loss_expr


def aligned_espn_wp(espn_wp: DataFrame, games: DataFrame) -> DataFrame:
    """Lag ESPN's post-play WP into a pre-play estimate over the
    explicit numeric play order, drop the first sample per game
    (R/espn_wp.R:47-53), and attach game metadata (J1: renamed key)."""
    seq = espn_wp.withColumn("play_id_num", F.col("play_id").cast("double"))
    w = Window.partitionBy("espn_game_id").orderBy("play_id_num")
    lagged = (
        seq.withColumn("espn_home_wp", F.lag("home_wp", 1).over(w))
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") > 1)  # dplyr::slice(-1)
        .drop("rn", "home_wp")
    )
    g = games.filter(
        F.col("result").isNotNull()
        & (F.col("result") != 0)
        & (F.col("week") <= 17)
    )
    return lagged.join(
        F.broadcast(g), lagged.espn_game_id == g.espn, "inner"
    ).select(
        "game_id",
        "espn_game_id",
        "play_id_num",
        "espn_home_wp",
        (F.col("result") > 0).cast("int").alias("home_win"),
    )


def with_vegas_wp(aligned: DataFrame, pbp: DataFrame) -> DataFrame:
    """Composite-key join to pbp for the vegas WP comparison column
    (R/espn_wp.R:75: by c('game_id','play_id')); carries ``down`` —
    the reference's play filters (:77 ``!is.na(down)``, :244-257
    ``down <= 4`` / ``down == 1``) need it downstream."""
    p = pbp.select(
        "game_id",
        F.col("play_id").alias("play_id_num"),
        "vegas_home_wp",
        "qtr",
        "down",
    )
    return aligned.join(p, ["game_id", "play_id_num"], "left")


def reference_play_filter(scored: DataFrame) -> DataFrame:
    """The shared plays filter (R/espn_wp.R:77): BOTH WP columns
    non-null, ``qtr <= 4``, and a non-null down — one frame feeds
    both calibration plots, so binning either column sees the same
    row set."""
    return scored.filter(
        F.col("vegas_home_wp").isNotNull()
        & F.col("espn_home_wp").isNotNull()
        & (F.col("qtr") <= 4)
        & F.col("down").isNotNull()
    )


def calibration_table(
    scored: DataFrame, wp_col: str, bin_width: float = 0.01
) -> DataFrame:
    """Calibration bins per quarter (R/espn_wp.R:87-99) over the
    shared plays filter (:77 — both WPs present, qtr ≤ 4, non-null
    down): bin the pre-play WP, count wins. Default width 0.01
    matches the reference (`round(espn_home_wp / 0.01) * .01`,
    R/espn_wp.R:89). Floor-binning (exact cross-engine); the R-parity
    HALF_EVEN binning lives in functions.calibration_bin."""
    binned = reference_play_filter(scored).withColumn(
        "bin", F.floor(F.col(wp_col) / bin_width) * bin_width
    )
    return binned.groupBy("qtr", "bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("home_win").cast("bigint").alias("n_wins"),
        F.avg(wp_col).alias("mean_wp"),
        F.avg(F.col("home_win").cast("double")).alias("win_rate"),
    )


def _clamped(scored: DataFrame) -> DataFrame:
    # MLmetrics::LogLoss clamps internally with eps = 1e-15
    # (y_pred <- pmax(pmin(y_pred, 1-1e-15), 1e-15)) — matched here
    # (r9: was 1e-9; only observable for wp exactly 0/1). Nulls never
    # reach this point (the :228 !is.na filters run first).
    eps = 1e-15
    clamp = lambda c: F.least(F.greatest(F.col(c), F.lit(eps)), F.lit(1 - eps))  # noqa: E731
    return scored.withColumn("espn_p", clamp("espn_home_wp")).withColumn(
        "vegas_p", clamp("vegas_home_wp")
    )


def logloss_by_quarter(scored: DataFrame) -> DataFrame:
    """Per-quarter log-loss slices for ESPN vs vegas WP — the
    long-form of the reference's q1..q4 columns (R/espn_wp.R:247-257:
    every slice filters ``down <= 4``, which in R also drops NA
    downs)."""
    df = _clamped(
        scored.filter(
            F.col("espn_home_wp").isNotNull()
            & F.col("vegas_home_wp").isNotNull()
            & (F.col("qtr") <= 4)
            & (F.col("down") <= 4)
        )
    )
    return df.groupBy("qtr").agg(
        F.count("*").cast("bigint").alias("n"),
        log_loss_expr("home_win", "espn_p").alias("logloss_espn"),
        log_loss_expr("home_win", "vegas_p").alias("logloss_vegas"),
    )


def logloss_table(scored: DataFrame) -> DataFrame:
    """The reference's summary table EXACTLY (R/espn_wp.R:244-289):
    rows = model × {all downs (``down <= 4``), 1st downs
    (``down == 1``)}, columns = all quarters + q1..q4. One grouped
    pass per down-slice instead of 20 collect()s."""
    out = None
    for type_lbl, down_cond in (
        ("All downs: log loss", F.col("down") <= 4),
        ("1st downs: log loss", F.col("down") == 1),
    ):
        df = _clamped(
            scored.filter(
                F.col("espn_home_wp").isNotNull()
                & F.col("vegas_home_wp").isNotNull()
                & (F.col("qtr") <= 4)
                & down_cond
            )
        )
        agg = df.agg(
            log_loss_expr("home_win", "espn_p").alias("all_espn"),
            log_loss_expr("home_win", "vegas_p").alias("all_vegas"),
            *[
                log_loss_expr(
                    "home_win",
                    F.when(F.col("qtr") == q, F.col(p_col)),
                ).alias(f"q{q}_{m}")
                for q in (1, 2, 3, 4)
                for m, p_col in (("espn", "espn_p"), ("vegas", "vegas_p"))
            ],
        )
        for model, m in (("ESPN", "espn"), ("nflfastR", "vegas")):
            row = agg.select(
                F.lit(model).alias("model"),
                F.lit(type_lbl).alias("type"),
                F.col(f"all_{m}").alias("all"),
                *[F.col(f"q{q}_{m}").alias(f"q{q}") for q in (1, 2, 3, 4)],
            )
            out = row if out is None else out.unionByName(row)
    return out


def first_play_logloss(scored: DataFrame) -> DataFrame:
    """The ``plays1`` metric (R/espn_wp.R:233-237): log-loss of each
    model on the FIRST play of every game (slice(1) in play order —
    the pre-game estimate). ``plays1`` slices from the 2020-block
    ``plays`` frame REDEFINED at :221-229, whose filter is only
    ``!is.na(nflfastr_home_wp), !is.na(espn_home_wp), qtr <= 4`` —
    there is NO ``!is.na(down)`` condition in that block (the later
    assignment shadows the :77 plot frame), so a game whose first
    surviving sample is a null-down play (e.g. a kickoff) IS scored
    on that play."""
    from pyspark.sql.window import Window as W

    w = W.partitionBy("game_id").orderBy("play_id_num")
    first = _clamped(
        scored.filter(
            F.col("vegas_home_wp").isNotNull()  # :229 !is.na(nflfastr_home_wp)
            & F.col("espn_home_wp").isNotNull()  # :229 !is.na(espn_home_wp)
            & (F.col("qtr") <= 4)  # :229
        )
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    return first.agg(
        F.count("*").cast("bigint").alias("n_games"),
        log_loss_expr("home_win", "espn_p").alias("logloss_espn"),
        log_loss_expr("home_win", "vegas_p").alias("logloss_vegas"),
    )


def qtr_label(qtr: Column | str = "qtr") -> Column:
    """The plot frames' ``fct_recode(factor(qtr), "1st Quarter" = "1",
    ...)`` (R/espn_wp.R:100-103, :148-151) as a column expression —
    the facet labels are part of the plotted data frame, not the gt
    theme. An out-of-range qtr keeps its number as a string exactly
    like fct_recode's passthrough of an unmapped level."""
    c = F.col(qtr) if isinstance(qtr, str) else qtr
    return (
        F.when(c == 1, "1st Quarter")
        .when(c == 2, "2nd Quarter")
        .when(c == 3, "3rd Quarter")
        .when(c == 4, "4th Quarter")
        .otherwise(c.cast("string"))
    )
