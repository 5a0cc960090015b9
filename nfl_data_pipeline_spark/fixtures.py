"""Deterministic NFL-shaped fixture generator (FIXTURES.md).

Small synthetic tables mirroring the schemas the reference's queries
touch, with the planned imperfections FIXTURES.md requires (null
posteam/epa/down/cpoe patterns, unplayed games, a tie, name variants,
vig in odds pairs). Seeded — every call produces identical data.

Used by the golden-pipeline tests (SURVEY.md §5.2 item 2); the driver
fixture tables serve the generic operator oracle instead.
"""

from __future__ import annotations

import random
from datetime import date, timedelta

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

from nfl_data_pipeline_spark import schemas

SEED = 42
TEAMS = ["SEA", "SF", "LA", "ARI", "KC", "BUF", "DAL", "GB"]
SEASONS = [2020, 2021, 2022]
WEEKS_PER_SEASON = 4
QBS = {
    "SEA": ("R.Wilson", "00-0029263"),
    "SF": ("J.Garoppolo", "00-0033106"),
    "LA": ("M.Stafford", "00-0026498"),
    "ARI": ("K.Murray", "00-0035228"),
    "KC": ("P.Mahomes", "00-0033873"),
    "BUF": ("J.Allen", "00-0034857"),
    "DAL": ("D.Prescott", "00-0033077"),
    "GB": ("A.Rodgers", "00-0023459"),
}


def _schedule(
    rng: random.Random,
    seasons: list[int] | None = None,
    weeks: int | None = None,
) -> list[dict]:
    """Round-robin-ish schedule: each week pairs the 8 teams into 4
    games; every pbp game_id exists here (referential integrity)."""
    games = []
    for season in seasons or SEASONS:
        for week in range(1, (weeks or WEEKS_PER_SEASON) + 1):
            order = TEAMS[:]
            rng.shuffle(order)
            for i in range(0, len(order), 2):
                away, home = order[i], order[i + 1]
                gid = f"{season}_{week:02d}_{away}_{home}"
                games.append(
                    {
                        "game_id": gid,
                        "season": season,
                        "week": week,
                        "home_team": home,
                        "away_team": away,
                        "result": rng.randint(-21, 24),
                        "espn": str(400_000_000 + rng.randint(1, 9_999_999)),
                    }
                )
    # planned imperfections: a few unplayed games and one tie
    games[-1]["result"] = None
    games[-2]["result"] = None
    games[0]["result"] = 0
    return games


def build_all(
    rng_seed: int = SEED,
    seasons: list[int] | None = None,
    weeks: int | None = None,
) -> dict[str, pd.DataFrame]:
    """Defaults reproduce the 3-season golden fixture; pass
    ``seasons``/``weeks`` for multi-season scale runs (the lag-panel /
    correlation-grid guards in tests/test_pipelines_scaled.py) —
    every generated table stays internally consistent at any size."""
    seasons = list(seasons or SEASONS)
    rng = random.Random(rng_seed)
    games = _schedule(rng, seasons, weeks)

    pbp_rows: list[dict] = []
    espn_wp_rows: list[dict] = []
    participation_rows: list[dict] = []
    base_date = date(2020, 9, 10)

    # per-game play-by-play
    for g in games:
        n_plays = 80
        gdate = base_date + timedelta(
            days=(g["season"] - 2020) * 365 + g["week"] * 7
        )
        home_wp = 0.5
        for p in range(1, n_plays + 1):
            posteam = g["home_team"] if (p // 6) % 2 == 0 else g["away_team"]
            defteam = g["away_team"] if posteam == g["home_team"] else g["home_team"]
            is_real_play = rng.random() > 0.02  # ~2% null posteam rows
            down = rng.randint(1, 4) if rng.random() > 0.12 else None
            is_pass = rng.random() < 0.58
            epa = rng.gauss(0, 1.5) if is_real_play else None
            qb_name, qb_id = QBS[posteam]
            home_wp = min(0.99, max(0.01, home_wp + rng.gauss(0, 0.03)))
            wp = home_wp if posteam == g["home_team"] else 1.0 - home_wp
            pbp_rows.append(
                {
                    "game_id": g["game_id"],
                    "play_id": float(p * 10),
                    "old_game_id": g["game_id"].replace("_", ""),
                    "season": g["season"],
                    "week": g["week"],
                    "season_type": "REG" if g["week"] <= 3 else "POST",
                    "game_date": gdate,
                    "home_team": g["home_team"],
                    "away_team": g["away_team"],
                    "posteam": posteam if is_real_play else None,
                    "defteam": defteam if is_real_play else None,
                    "qtr": min(5, 1 + p // 21),
                    "down": down,
                    "ydstogo": rng.randint(1, 10),
                    "desc": f"({p}) play description",
                    "play_type": "pass" if is_pass else "run",
                    "rush": 0 if is_pass else 1,
                    "pass": 1 if is_pass else 0,
                    "epa": epa,
                    "qb_epa": (epa + rng.gauss(0, 0.2)) if epa is not None else None,
                    "wp": round(wp, 4),
                    "vegas_home_wp": round(home_wp, 4),
                    "half_seconds_remaining": float(1800 - (p % 40) * 45),
                    "success": 1 if (epa or 0) > 0 else 0,
                    "first_down": rng.choice([0, 1, None]),
                    "yards_gained": float(rng.randint(-5, 25)),
                    "cpoe": rng.gauss(0, 8) if (is_pass and rng.random() > 0.4) else None,
                    "incomplete_pass": 1 if (is_pass and rng.random() < 0.33) else 0,
                    "complete_pass": 1 if (is_pass and rng.random() < 0.6) else 0,
                    "interception": 1 if (is_pass and rng.random() < 0.025) else 0,
                    "pass_touchdown": 1 if (is_pass and rng.random() < 0.05) else 0,
                    "name": qb_name if is_pass else None,
                    "id": qb_id if is_pass else None,
                    "passer_player_name": qb_name if is_pass else None,
                    "passer_player_id": qb_id if is_pass else None,
                }
            )
            # ESPN wp samples (string play ids, ordered sequence)
            if p % 2 == 0:
                espn_wp_rows.append(
                    {
                        "espn_game_id": g["espn"],
                        "play_id": str(p * 10),
                        "home_wp": round(
                            min(0.99, max(0.01, home_wp + rng.gauss(0, 0.01))), 4
                        ),
                    }
                )
            # participation (player id lists)
            off_ids = [qb_id] + [
                f"00-00{rng.randint(10000, 99999)}" for _ in range(10)
            ]
            def_ids = [f"00-00{rng.randint(10000, 99999)}" for _ in range(11)]
            participation_rows.append(
                {
                    "game_id": g["game_id"],
                    "old_game_id": g["game_id"].replace("_", ""),
                    "season": g["season"],
                    "week": g["week"],
                    "play_id": float(p * 10),
                    "posteam": posteam if is_real_play else None,
                    "defteam": defteam if is_real_play else None,
                    "desc": f"({p}) play description",
                    "offense_players": ";".join(off_ids),
                    "defense_players": ";".join(def_ids),
                    "defenders_in_box": rng.randint(5, 8),
                    "number_of_pass_rushers": rng.randint(3, 6),
                    "down": down,
                    "epa": epa,
                    "pass": 1 if is_pass else 0,
                    "rush": 0 if is_pass else 1,
                    "first_down": rng.choice([0, 1]),
                    "success": 1 if (epa or 0) > 0 else 0,
                }
            )

    roster_rows = [
        {"season": s, "gsis_id": gsis, "full_name": f"{name.split('.')[0]}. {name.split('.')[1]}"}
        for s in seasons
        for (name, gsis) in QBS.values()
    ]

    teams_rows = [
        {
            "team_abbr": t,
            "team_name": f"City {t}",
            "team_nick": f"Nick{t}",
            "team_color": "#112233",
            "team_color2": "#445566",
            "team_logo_espn": f"https://example.com/{t}.png",
        }
        for t in TEAMS
    ]

    qbr_rows = []
    for s in seasons:
        for t, (name, gsis) in QBS.items():
            first, last = name.split(".")
            # one QB-season missing (planned imperfection, epa audit)
            if s == 2021 and t == "ARI":
                continue
            qbr_rows.append(
                {
                    "season": s,
                    "name_first": first,
                    "name_last": last,
                    "player_id": str(abs(hash(gsis)) % 10_000),
                    "team": t,
                    "qb_plays": rng.randint(150, 300),
                    "qbr_total": round(rng.uniform(35, 80), 1),
                    "headshot_href": f"https://example.com/{gsis}.png",
                }
            )

    playcaller_rows = []
    for s in seasons:
        for t in TEAMS:
            pc = f"Coach_{t}_{1 if s < 2022 else 2}"  # change in 2022
            for _ in range(rng.randint(1, 3)):
                playcaller_rows.append(
                    {"season": s, "posteam": t, "off_play_caller": pc}
                )

    # SIS leaderboard / PFF grades / WAR (R/epa_predict.R:65-158).
    # Full "First Last" names that the pipeline must separate and
    # initial-join; DAL's QB is planted under his legal first name
    # ("Rayne Prescott" → naive R.Prescott ≠ pbp's D.Prescott), the
    # analog of the reference's sis_id-955 → "R.Griffin III" repair.
    full_names = {
        "SEA": "Russell Wilson",
        "SF": "Jimmy Garoppolo",
        "LA": "Matthew Stafford",
        "ARI": "Kyler Murray",
        "KC": "Patrick Mahomes",
        "BUF": "Josh Allen",
        "DAL": "Rayne Prescott",  # planted name variant
        "GB": "Aaron Rodgers",
    }
    sis_rows, pff_rows, war_rows = [], [], []
    for s in seasons:
        for i, t in enumerate(TEAMS):
            sis_id, pff_id = 900 + i, 7000 + i
            n_plays = rng.randint(250, 450)
            tp = round(rng.uniform(-20, 90), 1)
            # one QB-season missing from SIS (audit imperfection)
            if not (s == 2020 and t == "GB"):
                sis_rows.append(
                    {
                        "season": s,
                        "player_name": full_names[t],
                        "player_id": sis_id,
                        "total_points": tp,
                        "total_points_per_play": round(tp / n_plays, 5),
                        "iqr": round(rng.uniform(0, 30), 1),
                    }
                )
            pff_rows.append(
                {
                    "season": s,
                    "player": full_names[t],
                    "player_id": pff_id,
                    "grades_offense": round(rng.uniform(40, 95), 1),
                    "grades_pass": round(rng.uniform(40, 95), 1),
                    "team_name": f"City {t}",
                }
            )
            # WAR: one zero-snap row and one null WAR planted so the
            # reference's filter(snaps > 0, !is.na(WAR)) has work
            war_rows.append(
                {
                    "season": s,
                    "player": full_names[t],
                    "player_id": pff_id,
                    "snaps": 0 if (s == 2020 and t == "SF") else rng.randint(300, 700),
                    "war": None
                    if (s == 2021 and t == "LA")
                    else round(rng.uniform(-0.5, 4.0), 3),
                }
            )

    # DraftKings-style odds: Under/Over pairs with vig
    dk_rows = []
    for i, player in enumerate(
        ["Aidan Hutchinson", "Travon Walker", "Evan Neal", "Kayvon Thibodeaux"]
    ):
        line = 2.5 + i
        p_under = 0.45 + 0.05 * (i % 3)
        for side, p in (("Under", p_under * 1.1), ("Over", (1 - p_under) * 1.1)):
            odds = (
                -round(100 * p / (1 - p)) if p >= 0.5 else round(100 * (1 - p) / p)
            )
            dk_rows.append(
                {
                    "player": f"{player} Draft Position",
                    "pick": line,
                    "label": f"{side} {line}",
                    "oddsAmerican": str(odds),
                }
            )

    return {
        "cleaned_pbp": pd.DataFrame(pbp_rows),
        "games": pd.DataFrame(games),
        "roster": pd.DataFrame(roster_rows),
        "participation": pd.DataFrame(participation_rows),
        "teams": pd.DataFrame(teams_rows),
        "qbr": pd.DataFrame(qbr_rows),
        "playcallers": pd.DataFrame(playcaller_rows),
        "espn_wp": pd.DataFrame(espn_wp_rows),
        "dk_draft_odds": pd.DataFrame(dk_rows),
        "sis": pd.DataFrame(sis_rows),
        "pff_qb_grades": pd.DataFrame(pff_rows),
        "war": pd.DataFrame(war_rows),
    }


_SCHEMA_BY_NAME = {
    "cleaned_pbp": schemas.CLEANED_PBP,
    "games": schemas.GAMES,
    "roster": schemas.ROSTER,
    "participation": schemas.PARTICIPATION,
    "teams": schemas.TEAMS,
    "qbr": schemas.QBR,
    "playcallers": schemas.PLAYCALLERS,
    "espn_wp": schemas.ESPN_WP,
    "dk_draft_odds": schemas.DK_DRAFT_ODDS,
    "sis": schemas.SIS,
    "pff_qb_grades": schemas.PFF_QB_GRADES,
    "war": schemas.WAR,
}


def spark_fixtures(
    spark: SparkSession,
    rng_seed: int = SEED,
    seasons: list[int] | None = None,
    weeks: int | None = None,
) -> dict[str, DataFrame]:
    """All fixture tables as Spark DataFrames with their declared
    schemas (types enforced, not inferred)."""
    from pyspark.sql import types as T

    pdfs = build_all(rng_seed, seasons=seasons, weeks=weeks)
    out = {}
    for name, pdf in pdfs.items():
        schema = _SCHEMA_BY_NAME[name]
        cols = [f.name for f in schema.fields]
        int_cols = {
            f.name
            for f in schema.fields
            if isinstance(f.dataType, (T.IntegerType, T.LongType))
        }

        def cell(col, v):
            # pandas upcasts nullable int columns to float (4 → 4.0);
            # coerce back per declared schema
            if v is None or pd.isna(v):
                return None
            if col in int_cols:
                return int(v)
            return v

        recs = [
            tuple(cell(c, v) for c, v in zip(cols, row))
            for row in pdf[cols].itertuples(index=False)
        ]
        out[name] = spark.createDataFrame(recs, schema)
    return out
