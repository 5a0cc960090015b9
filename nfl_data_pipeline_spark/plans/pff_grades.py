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

# site week slots → real playoff weeks (pff/0_scrape.R:58-67)
_PLAYOFF_WEEK = {28: 19, 29: 20, 30: 21, 32: 22}


def remap_week(week: Column | str) -> Column:
    w = F.col(week) if isinstance(week, str) else week
    expr = None
    for slot, real in _PLAYOFF_WEEK.items():
        expr = (
            F.when(w == slot, real)
            if expr is None
            else expr.when(w == slot, real)
        )
    return expr.otherwise(w)


def clean_week_panel(raw: DataFrame, team_map: dict[str, str]) -> DataFrame:
    """Week remap + team normalization — the per-fetch clean stage
    (pff/0_scrape.R:54-69) as one narrow projection."""
    mapping = F.create_map(
        *[F.lit(x) for kv in team_map.items() for x in kv]
    )
    return raw.withColumn("week", remap_week("week").cast("int")).withColumn(
        "team_abbr",
        F.coalesce(F.try_element_at(mapping, F.col("team_abbr")), F.col("team_abbr")),
    )


def clean_player_name(name: Column | str) -> Column:
    """Ourlads depth-chart name cleaning (pff/6a_ourlads_scrape.R:31-44):
    drop trailing draft annotations (e.g. '23/1' pick marks), squish
    whitespace, title-case, flip 'LAST, FIRST' → 'First Last'."""
    c = F.col(name) if isinstance(name, str) else name
    c = F.regexp_replace(c, r"\s+[0-9]+/[0-9]+[A-Za-z]*$", "")  # draft marks
    c = F.trim(F.regexp_replace(c, r"\s+", " "))  # str_squish
    last = F.split(c, ", ").getItem(0)
    first = F.split(c, ", ").getItem(1)
    flipped = F.when(
        c.contains(", "), F.concat_ws(" ", first, last)
    ).otherwise(c)
    return F.initcap(F.lower(flipped))  # str_to_title


def depth_chart(raw: DataFrame) -> DataFrame:
    """(team, position slot, raw name) → cleaned starter table."""
    return raw.select(
        F.col("current_team"),
        F.col("position_ourlads"),
        clean_player_name("player").alias("player"),
    )
