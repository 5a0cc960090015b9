"""Window-function queries — SURVEY.md §2.5, the reference workload's
center of gravity (`group_by %>% arrange %>% mutate` everywhere).

Determinism note (SURVEY §7 hard-part 1): the reference relies on
silent row order for lag/cumsum/slice; every window here carries a
total order (a real sort key plus a unique-key tiebreak), so results
are reproducible on any cluster layout.

Running sums are computed in ORDER BY order on both engines, so plain
double arithmetic matches bit-for-bit — no decimal detour needed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.queries import register


def _events_ts_ns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events with ts as epoch-nanos bigint (see catalog.load docstring)."""
    return load(spark, sf_dir, "events").withColumnRenamed("ts", "ts_ns")


@register(
    "lag_panel",
    """
    SELECT o_orderkey AS okey,
           o_custkey AS ckey,
           LAG(o_totalprice, 1) OVER w AS prev_price,
           o_totalprice - LAG(o_totalprice, 1) OVER w AS price_delta,
           CASE WHEN o_orderstatus != LAG(o_orderstatus, 1) OVER w
                THEN 1 ELSE 0 END AS status_changed
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    survey_ids=("W1", "W2", "W11", "P9"),
    doc="Lag by entity ordered by time — the 13-column lag panel of "
    "R/epa_predict.R:241-261 and the lag-vs-current change flag of "
    ":50-57 (`new_pc = ifelse(pc != lag(pc), 1, 0)`). NULL != x is "
    "NULL → flag falls to 0 via the ELSE, matching R's ifelse on NA "
    "only because both engines agree; the r_* shims cover the "
    "NA-propagating variant.",
)
def lag_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice", 1).over(w)
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ckey"),
        prev.alias("prev_price"),
        (F.col("o_totalprice") - prev).alias("price_delta"),
        F.when(F.col("o_orderstatus") != F.lag("o_orderstatus", 1).over(w), 1)
        .otherwise(0)
        .alias("status_changed"),
    )


@register(
    "top1_per_group",
    """
    SELECT ckey, okey, total FROM (
      SELECT o_custkey AS ckey, o_orderkey AS okey, o_totalprice AS total,
             ROW_NUMBER() OVER (
               PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC
             ) AS rn
      FROM orders
    ) t WHERE rn = 1
    """,
    survey_ids=("W3",),
    doc="Top-1 per group dedup — arrange + group_by + slice(1) "
    "(R/epa_predict.R:29-33, R/nfc_west_starting_qbs.R:17-20): the "
    "reference's most-repeated idiom. Explicit (value desc, key asc) "
    "tiebreak replaces R's silent file order.",
)
def top1_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ckey"),
            F.col("o_orderkey").alias("okey"),
            F.col("o_totalprice").alias("total"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "last_per_group",
    """
    SELECT user_id, event_id, event_type FROM (
      SELECT user_id, event_id, event_type,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC
             ) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
    survey_ids=("W4",),
    doc="Last row per group — slice_tail() "
    "(darko/2_ourlads_projections.R:38,105): latest event per user.",
)
def last_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts_ns").desc(), F.col("event_id").desc()
    )
    return (
        _events_ts_ns(spark, sf_dir)
        .select(
            "user_id",
            "event_id",
            "event_type",
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )


@register(
    "drop_first_row",
    """
    SELECT user_id, event_id, rn FROM (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
             ) AS rn
      FROM events
    ) t WHERE rn > 1
    """,
    survey_ids=("W5",),
    doc="Drop first row per sequence — dplyr::slice(-1) "
    "(R/espn_wp.R:53: drop the first WP sample of each game).",
)
def drop_first_row(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    return (
        _events_ts_ns(spark, sf_dir)
        .select("user_id", "event_id", F.row_number().over(w).alias("rn"))
        .filter(F.col("rn") > 1)
    )


@register(
    "running_sum_flag",
    """
    SELECT event_id, user_id,
           SUM(value) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_value,
           CASE WHEN SUM(CASE WHEN value > 15 THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) > 0 THEN 1 ELSE 0 END AS gone_big
    FROM events
    """,
    survey_ids=("W6", "W7"),
    doc="Grouped running sum → sticky state flag — the 'game over' "
    "cumsum flag of R/wilson_game_pass_freq.R:22-37 and the draft-odds "
    "CDF cumsum of R/nfl_draft_espn_dk.R:75-81. Prefix sums evaluate "
    "in ORDER BY order on both engines → bit-identical doubles.",
)
def running_sum_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ns", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    big = F.when(F.col("value") > 15, 1).otherwise(0)
    return _events_ts_ns(spark, sf_dir).select(
        "event_id",
        "user_id",
        F.sum("value").over(w).alias("cum_value"),
        F.when(F.sum(big).over(w) > 0, 1).otherwise(0).alias("gone_big"),
    )


@register(
    "rank_and_pctile",
    """
    SELECT c_custkey AS ckey,
           c_nationkey AS nationkey,
           rank_in_nation,
           100.0 * (1 + max_rank - rank_in_nation) / max_rank AS pct_normed,
           PERCENT_RANK() OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
           ) AS pctl
    FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ) AS rank_in_nation,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS max_rank
      FROM customer
    ) t
    """,
    survey_ids=("W8", "W9"),
    doc="Rank index + percentile-from-rank — arrange + mutate(rank=1:n()) "
    "and `pct_normed = 100*(1+max(rank)-rank)/max(rank)` "
    "(darko/2_ourlads_projections.R:106-113).",
)
def rank_and_pctile(spark: SparkSession, sf_dir: str) -> DataFrame:
    wdesc = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wasc = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wall = Window.partitionBy("c_nationkey")
    rank = F.row_number().over(wdesc)
    max_rank = F.count("*").over(wall)
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_nationkey").alias("nationkey"),
        rank.alias("rank_in_nation"),
        (100.0 * (1 + max_rank - rank) / max_rank).alias("pct_normed"),
        F.percent_rank().over(wasc).alias("pctl"),
    )


@register(
    "minmax_rescale",
    """
    SELECT c_custkey AS ckey,
           c_nationkey AS nationkey,
           100.0 * (c_acctbal - MIN(c_acctbal) OVER w)
             / (MAX(c_acctbal) OVER w - MIN(c_acctbal) OVER w) AS bal_scaled
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey)
    """,
    survey_ids=("W10",),
    doc="Group-relative min-max rescale — pff/99_passblock_piece.R:43-53 "
    "(`100*(wr-min(wr))/max(wr-min(wr))` per season). min/max are "
    "order-independent; the arithmetic is a single IEEE expression → "
    "deterministic.",
)
def minmax_rescale(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey")
    lo, hi = F.min("c_acctbal").over(w), F.max("c_acctbal").over(w)
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_nationkey").alias("nationkey"),
        (100.0 * (F.col("c_acctbal") - lo) / (hi - lo)).alias("bal_scaled"),
    )


@register(
    "slice_range_rows",
    """
    SELECT nationkey, ckey, rn FROM (
      SELECT c_nationkey AS nationkey, c_custkey AS ckey,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ) AS rn
      FROM customer
    ) t WHERE rn BETWEEN 2 AND 4
    """,
    survey_ids=("O4", "O5"),
    doc="Row-range slice — dplyr::slice(1:16) / t[1:24,] layout slicing "
    "(darko/2_ourlads_projections.R:157-162, R/nfl_draft_espn_dk.R:106-109) "
    "as rank-bounded filter.",
)
def slice_range_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    return (
        load(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.col("c_custkey").alias("ckey"),
            F.row_number().over(w).alias("rn"),
        )
        .filter(F.col("rn").between(2, 4))
    )
