"""PFF grade-panel cleaning — the engine half of ``pff/0_scrape.R``
and ``pff/6a_ourlads_scrape.R`` (the HTTP fetch itself is an edge
connector; see sources/readers.fetch_over_plan).

Moves: playoff week remapping (``0_scrape.R:58-67`` — site week slots
28-30,32 → sequential playoff weeks), team-name normalization before
panel assembly (``:57,123``), and the depth-chart name cleaning chain
(``6a_ourlads_scrape.R:31-44``: strip draft annotations, squish
whitespace, title-case, "Last, First" → "First Last").
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# nflfastR:::team_name_fn — the historical-abbreviation remap the
# reference applies before every panel assembly/join
# (pff/0_scrape.R:57,123,180,250,315; pff/99_passblock_piece.R:53;
# R/preseason_predictiveness.R:63,79,105). The map is nflfastR's
# public helper (nflfastR R/utils.R, MIT): site/era abbreviations →
# the franchise's current abbreviation; everything else passes
# through unchanged.
TEAM_NAME_MAP = {
    "JAC": "JAX",
    "STL": "LA",
    "SL": "LA",
    "ARZ": "ARI",
    "BLT": "BAL",
    "CLV": "CLE",
    "HST": "HOU",
    "SD": "LAC",
    "OAK": "LV",
}


def team_name_fn(
    col: Column | str, team_map: dict[str, str] | None = None
) -> Column:
    """``nflfastR:::team_name_fn`` as a column expression — a literal
    map with identity fallback (the J9 map_normalize idiom). NULL
    teams stay NULL, like R's case_when TRUE ~ var arm. ``team_map``
    overrides the pinned reference map (``{}`` = identity)."""
    c = F.col(col) if isinstance(col, str) else col
    if team_map is None:
        team_map = TEAM_NAME_MAP
    mapping = F.create_map(
        *[F.lit(x) for kv in team_map.items() for x in kv]
    )
    return F.coalesce(F.try_element_at(mapping, c), c)


def remap_week(week: Column | str, season: Column | str) -> Column:
    """Site week slots → real playoff weeks — SEASON-DEPENDENT
    exactly as pff/0_scrape.R:58-67 (the 17-game era shifted the
    playoff calendar): pre-2021 seasons map 28-30 → week−10 and the
    Super Bowl slot 32 → 21; 2021+ map 28-30 → week−9 and 32 → 22."""
    w = F.col(week) if isinstance(week, str) else week
    s = F.col(season) if isinstance(season, str) else season
    pre = s < 2021
    return (
        F.when(pre & w.between(28, 30), w - 10)
        .when(pre & (w == 32), F.lit(21))
        .when(~pre & w.between(28, 30), w - 9)
        .when(~pre & (w == 32), F.lit(22))
        .otherwise(w)
    )


def clean_week_panel(
    raw: DataFrame,
    team_map: dict[str, str] | None = None,
    season_col: str = "season",
) -> DataFrame:
    """Week remap + team normalization — the per-fetch clean stage
    (pff/0_scrape.R:54-69) as one narrow projection, including the
    stage's base filter ``filter(!is.na(grades_pass_block))``
    (``:55``) when the frame carries that column (test frames built
    around the week/team moves alone may omit it). Frames without a
    season column clean under the 2021+ calendar. ``team_map``
    defaults to the reference's remap (``:57``
    ``mutate_at(c("team_abbr"), nflfastR:::team_name_fn)`` =
    TEAM_NAME_MAP); pass ``{}`` to disable."""
    season = (
        F.col(season_col) if season_col in raw.columns else F.lit(2021)
    )
    if "grades_pass_block" in raw.columns:
        raw = raw.filter(F.col("grades_pass_block").isNotNull())
    return raw.withColumn(
        "week", remap_week(F.col("week"), season).cast("int")
    ).withColumn("team_abbr", team_name_fn("team_abbr", team_map))


def _ourlads_scrub(c: Column) -> Column:
    """The :31-39 cleaning chain shared by both call sites: drop a
    space-preceded digits-or-caps run followed by '/' and everything
    after (draft marks like '23/1', school slashes), drop
    space-preceded CAPS+digits tokens, squish whitespace, title-case
    (Java regex supports the reference's lookbehinds verbatim)."""
    c = F.regexp_replace(c, r"(?<=\s)([0-9]*|[A-Z]*)/.*", "")
    c = F.regexp_replace(c, r"(?<=\s)[A-Z]+[0-9]+", "")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))  # str_squish
    return F.initcap(F.lower(c))  # str_to_title


def clean_player_name(name: Column | str) -> Column:
    """Ourlads depth-chart name cleaning (pff/6a_ourlads_scrape.R:
    31-40): the shared scrub, then flip 'LAST, FIRST' → 'First Last'
    (the strsplit(', ') step, ``:41-44``)."""
    c = _ourlads_scrub(F.col(name) if isinstance(name, str) else name)
    last = F.split(c, ", ").getItem(0)
    first = F.split(c, ", ").getItem(1)
    return F.when(
        c.contains(", "), F.concat_ws(" ", first, last)
    ).otherwise(c)


def depth_chart(raw: DataFrame) -> DataFrame:
    """(team, position slot, raw name) → cleaned starter table."""
    return raw.select(
        F.col("current_team"),
        F.col("position_ourlads"),
        clean_player_name("player").alias("player"),
    )


OL_POSITIONS = ("LT", "LG", "C", "RG", "RT")


def depth_chart_starters(
    raw: DataFrame,
    fa: DataFrame,
    positions: tuple[str, ...] = OL_POSITIONS,
) -> DataFrame:
    """The full engine half of get_depth_chart
    (pff/6a_ourlads_scrape.R:22-44): the free-agent fallback chain —
    ``player_1 %in% fa & player_2 %in% fa → player_3``,
    ``player_1 %in% fa → player_2``, else ``player_1`` (:22-27) —
    then the OL position filter (:28), the cleaning chain, and the
    strsplit(', ') first/last split (:40-44). ``raw`` carries
    ``(team_abbr, pos, player_1, player_2, player_3)``; ``fa`` is the
    flagged free-agent list ``(team_abbr, player)`` (the ``.lc_red``
    nodes — the HTML fetch itself stays at the edge). The per-team FA
    set broadcasts (≤ roster size), so the fallback is a narrow
    projection — no shuffle of the depth rows."""
    fa_lists = fa.groupBy("team_abbr").agg(
        F.collect_set("player").alias("_fa")
    )
    d = raw.join(F.broadcast(fa_lists), "team_abbr", "left").withColumn(
        "_fa", F.coalesce("_fa", F.array().cast("array<string>"))
    )
    in_fa = lambda c: F.array_contains(F.col("_fa"), F.col(c))  # noqa: E731
    starter = (
        F.when(
            in_fa("player_1") & in_fa("player_2"), F.col("player_3")
        )
        .when(in_fa("player_1"), F.col("player_2"))
        .otherwise(F.col("player_1"))
    )
    # clean BEFORE the comma split, exactly as the reference (:31-39
    # run before strsplit at :41) — but without the flip, since first
    # and last come out as separate columns here
    c = _ourlads_scrub(starter)
    return (
        d.filter(F.col("pos").isin(*positions))
        .withColumn("_clean", c)
        .select(
            F.split("_clean", ", ").getItem(1).alias("first"),
            F.split("_clean", ", ").getItem(0).alias("last"),
            F.col("pos").alias("position"),
            "team_abbr",
        )
    )
