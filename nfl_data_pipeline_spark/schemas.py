"""Explicit schemas for every table the engine touches.

The reference never declares a schema anywhere — ``dbWriteTable(...,
append=TRUE)`` infers from the first data frame (``1_rebuild_db.R:30``)
and every CSV/JSON/HTML reader infers types (SURVEY.md §1.3). We fix
the schemas explicitly: at 100 TB an inferSchema pass is a full extra
scan, and silent type drift between appends corrupts the table.

Two families:
1. the driver fixture tables (TESTDATA.md) — used by the oracle gate,
2. the NFL domain tables (FIXTURES.md) — used by the golden pipelines.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --------------------------------------------------------------------------
# 1. Driver fixture tables (TPC-H-ish; TESTDATA.md)
# --------------------------------------------------------------------------

REGION = T.StructType(
    [
        T.StructField("r_regionkey", T.IntegerType()),
        T.StructField("r_name", T.StringType()),
    ]
)

NATION = T.StructType(
    [
        T.StructField("n_nationkey", T.IntegerType()),
        T.StructField("n_name", T.StringType()),
        T.StructField("n_regionkey", T.IntegerType()),
    ]
)

CUSTOMER = T.StructType(
    [
        T.StructField("c_custkey", T.LongType()),
        T.StructField("c_name", T.StringType()),
        T.StructField("c_nationkey", T.IntegerType()),
        T.StructField("c_acctbal", T.DoubleType()),
        T.StructField("c_mktsegment", T.StringType()),
    ]
)

SUPPLIER = T.StructType(
    [
        T.StructField("s_suppkey", T.LongType()),
        T.StructField("s_name", T.StringType()),
        T.StructField("s_nationkey", T.IntegerType()),
        T.StructField("s_acctbal", T.DoubleType()),
    ]
)

PART = T.StructType(
    [
        T.StructField("p_partkey", T.LongType()),
        T.StructField("p_name", T.StringType()),
        T.StructField("p_brand", T.StringType()),
        T.StructField("p_type", T.StringType()),
        T.StructField("p_size", T.IntegerType()),
        T.StructField("p_retailprice", T.DoubleType()),
    ]
)

ORDERS = T.StructType(
    [
        T.StructField("o_orderkey", T.LongType()),
        T.StructField("o_custkey", T.LongType()),
        T.StructField("o_orderstatus", T.StringType()),
        T.StructField("o_totalprice", T.DoubleType()),
        T.StructField("o_orderdate", T.TimestampNTZType()),
        T.StructField("o_orderpriority", T.StringType()),
    ]
)

LINEITEM = T.StructType(
    [
        T.StructField("l_orderkey", T.LongType()),
        T.StructField("l_partkey", T.LongType()),
        T.StructField("l_suppkey", T.LongType()),
        T.StructField("l_linenumber", T.IntegerType()),
        T.StructField("l_quantity", T.DoubleType()),
        T.StructField("l_extendedprice", T.DoubleType()),
        T.StructField("l_discount", T.DoubleType()),
        T.StructField("l_tax", T.DoubleType()),
        T.StructField("l_returnflag", T.StringType()),
        T.StructField("l_linestatus", T.StringType()),
        T.StructField("l_shipdate", T.TimestampNTZType()),
    ]
)

EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)

DOCUMENTS = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)

EMBEDDINGS = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
        T.StructField("label", T.IntegerType()),
    ]
)

FIXTURE_SCHEMAS: dict[str, T.StructType] = {
    "region": REGION,
    "nation": NATION,
    "customer": CUSTOMER,
    "supplier": SUPPLIER,
    "part": PART,
    "orders": ORDERS,
    "lineitem": LINEITEM,
    "events": EVENTS,
    "documents": DOCUMENTS,
    "embeddings": EMBEDDINGS,
}

# --------------------------------------------------------------------------
# 2. NFL domain tables (FIXTURES.md) — golden-pipeline inputs.
#    Column inventory = union of columns the reference queries touch.
# --------------------------------------------------------------------------

# cleaned_pbp: one row per play; key (game_id, play_id); partition by
# season (reference: single SQLite table, `1_rebuild_db.R:23-31`).
CLEANED_PBP = T.StructType(
    [
        T.StructField("game_id", T.StringType(), False),
        T.StructField("play_id", T.DoubleType(), False),
        T.StructField("old_game_id", T.StringType()),
        T.StructField("season", T.IntegerType(), False),
        T.StructField("week", T.IntegerType()),
        T.StructField("season_type", T.StringType()),
        T.StructField("game_date", T.DateType()),
        T.StructField("home_team", T.StringType()),
        T.StructField("away_team", T.StringType()),
        T.StructField("posteam", T.StringType()),
        T.StructField("defteam", T.StringType()),
        T.StructField("qtr", T.IntegerType()),
        T.StructField("down", T.IntegerType()),
        T.StructField("ydstogo", T.IntegerType()),
        T.StructField("desc", T.StringType()),
        T.StructField("play_type", T.StringType()),
        T.StructField("rush", T.IntegerType()),
        T.StructField("pass", T.IntegerType()),
        T.StructField("epa", T.DoubleType()),
        T.StructField("qb_epa", T.DoubleType()),
        T.StructField("wp", T.DoubleType()),
        T.StructField("vegas_home_wp", T.DoubleType()),
        T.StructField("half_seconds_remaining", T.DoubleType()),
        T.StructField("success", T.IntegerType()),
        T.StructField("first_down", T.IntegerType()),
        T.StructField("yards_gained", T.DoubleType()),
        T.StructField("cpoe", T.DoubleType()),
        T.StructField("incomplete_pass", T.IntegerType()),
        T.StructField("complete_pass", T.IntegerType()),
        T.StructField("interception", T.IntegerType()),
        T.StructField("pass_touchdown", T.IntegerType()),
        T.StructField("name", T.StringType()),
        T.StructField("id", T.StringType()),
        T.StructField("passer_player_name", T.StringType()),
        T.StructField("passer_player_id", T.StringType()),
    ]
)

GAMES = T.StructType(
    [
        T.StructField("game_id", T.StringType(), False),
        T.StructField("season", T.IntegerType()),
        T.StructField("week", T.IntegerType()),
        T.StructField("home_team", T.StringType()),
        T.StructField("away_team", T.StringType()),
        T.StructField("result", T.IntegerType()),
        T.StructField("espn", T.StringType()),
    ]
)

ROSTER = T.StructType(
    [
        T.StructField("season", T.IntegerType()),
        T.StructField("gsis_id", T.StringType()),
        T.StructField("full_name", T.StringType()),
    ]
)

PARTICIPATION = T.StructType(
    [
        T.StructField("game_id", T.StringType()),
        T.StructField("old_game_id", T.StringType()),
        T.StructField("season", T.IntegerType()),
        T.StructField("week", T.IntegerType()),
        T.StructField("play_id", T.DoubleType()),
        T.StructField("posteam", T.StringType()),
        T.StructField("defteam", T.StringType()),
        T.StructField("desc", T.StringType()),
        T.StructField("offense_players", T.StringType()),
        T.StructField("defense_players", T.StringType()),
        T.StructField("defenders_in_box", T.IntegerType()),
        T.StructField("number_of_pass_rushers", T.IntegerType()),
        T.StructField("down", T.IntegerType()),
        T.StructField("epa", T.DoubleType()),
        T.StructField("pass", T.IntegerType()),
        T.StructField("rush", T.IntegerType()),
        T.StructField("first_down", T.IntegerType()),
        T.StructField("success", T.IntegerType()),
    ]
)

TEAMS = T.StructType(
    [
        T.StructField("team_abbr", T.StringType(), False),
        T.StructField("team_name", T.StringType()),
        T.StructField("team_nick", T.StringType()),
        T.StructField("team_color", T.StringType()),
        T.StructField("team_color2", T.StringType()),
        T.StructField("team_logo_espn", T.StringType()),
    ]
)

QBR = T.StructType(
    [
        T.StructField("season", T.IntegerType()),
        T.StructField("name_first", T.StringType()),
        T.StructField("name_last", T.StringType()),
        T.StructField("player_id", T.StringType()),
        T.StructField("team", T.StringType()),
        T.StructField("qb_plays", T.IntegerType()),
        T.StructField("qbr_total", T.DoubleType()),
        T.StructField("headshot_href", T.StringType()),
    ]
)

DK_DRAFT_ODDS = T.StructType(
    [
        T.StructField("player", T.StringType()),
        T.StructField("pick", T.DoubleType()),
        T.StructField("label", T.StringType()),
        T.StructField("oddsAmerican", T.StringType()),
    ]
)

ESPN_WP = T.StructType(
    [
        T.StructField("espn_game_id", T.StringType()),
        T.StructField("play_id", T.StringType()),
        T.StructField("home_wp", T.DoubleType()),
    ]
)

PLAYCALLERS = T.StructType(
    [
        T.StructField("season", T.IntegerType()),
        T.StructField("posteam", T.StringType()),
        T.StructField("off_play_caller", T.StringType()),
    ]
)

# SIS leaderboard rows (R/epa_predict.R:65-86): full "First Last"
# player_name that the pipeline separates + initial-joins, with the
# id-keyed name-repair case_when.
SIS = T.StructType(
    [
        T.StructField("season", T.IntegerType()),
        T.StructField("player_name", T.StringType()),
        T.StructField("player_id", T.IntegerType()),
        T.StructField("total_points", T.DoubleType()),
        T.StructField("total_points_per_play", T.DoubleType()),
        T.StructField("iqr", T.DoubleType()),
    ]
)

# PFF QB grade CSVs (R/epa_predict.R:115-137).
PFF_QB_GRADES = T.StructType(
    [
        T.StructField("season", T.IntegerType()),
        T.StructField("player", T.StringType()),
        T.StructField("player_id", T.IntegerType()),
        T.StructField("grades_offense", T.DoubleType()),
        T.StructField("grades_pass", T.DoubleType()),
        T.StructField("team_name", T.StringType()),
    ]
)

# WAR csv (R/epa_predict.R:143-158): snaps>0 / null-WAR imperfections
# planted so the reference's filter has something to drop.
WAR = T.StructType(
    [
        T.StructField("season", T.IntegerType()),
        T.StructField("player", T.StringType()),
        T.StructField("player_id", T.IntegerType()),
        T.StructField("snaps", T.IntegerType()),
        T.StructField("war", T.DoubleType()),
    ]
)


def assert_schema(df, expected: T.StructType, name: str = "table") -> None:
    """Cheap structural check: same column names and types, order-insensitive.

    Replaces the reference's "hope the inferred schema matched" posture.
    """
    got = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    want = {f.name: f.dataType.simpleString() for f in expected.fields}
    if got != want:
        missing = {k: v for k, v in want.items() if got.get(k) != v}
        extra = {k: v for k, v in got.items() if want.get(k) != v}
        raise ValueError(
            f"schema mismatch for {name}: expected-but-absent/different "
            f"{missing}; present-but-unexpected/different {extra}"
        )
