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
                THEN 1 ELSE 0 END AS status_changed,
           CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           CAST(DATE_DIFF('day', CAST(LAG(o_orderdate, 1) OVER w AS DATE),
                          CAST(o_orderdate AS DATE)) AS BIGINT)
             AS days_since_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
    survey_ids=("W1", "W2", "W11", "P9", "§2.9-date"),
    doc="Lag by entity ordered by time — the 13-column lag panel of "
    "R/epa_predict.R:241-261 and the lag-vs-current change flag of "
    ":50-57 (`new_pc = ifelse(pc != lag(pc), 1, 0)`). NULL != x is "
    "NULL → flag falls to 0 via the ELSE, matching R's ifelse on NA "
    "only because both engines agree; the r_* shims cover the "
    "NA-propagating variant. Date family (§2.9): year/month part "
    "extraction (the per-season axis of 1_rebuild_db.R:39-50) and "
    "lag-date arithmetic (`days_since_prev`, the lubridate "
    "game_date ops of 2_scrape_new_games.R:24) ride the same window "
    "pass.",
)
def lag_panel(spark: SparkSession, sf_dir: str) -> DataFrame:
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_totalprice", 1).over(w)
    prev_date = F.lag("o_orderdate", 1).over(w)
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ckey"),
        prev.alias("prev_price"),
        (F.col("o_totalprice") - prev).alias("price_delta"),
        F.when(F.col("o_orderstatus") != F.lag("o_orderstatus", 1).over(w), 1)
        .otherwise(0)
        .alias("status_changed"),
        F.year("o_orderdate").alias("order_year"),
        F.month("o_orderdate").alias("order_month"),
        F.datediff(F.col("o_orderdate").cast("date"), prev_date.cast("date"))
        .cast("bigint")
        .alias("days_since_prev"),
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
    "row_slices",
    """
    SELECT CAST(user_id AS BIGINT) AS grp, CAST(event_id AS BIGINT) AS id,
           rn, 'drop_first' AS kind
    FROM (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
             ) AS rn
      FROM events
    ) t WHERE rn > 1
    UNION ALL
    SELECT CAST(c_nationkey AS BIGINT) AS grp, CAST(c_custkey AS BIGINT) AS id,
           rn, 'slice_range' AS kind
    FROM (
      SELECT c_nationkey, c_custkey,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ) AS rn
      FROM customer
    ) t WHERE rn BETWEEN 2 AND 4
    UNION ALL
    SELECT CAST(user_id AS BIGINT) AS grp, CAST(event_id AS BIGINT) AS id,
           rn, 'last_row' AS kind
    FROM (
      SELECT user_id, event_id,
             ROW_NUMBER() OVER (
               PARTITION BY user_id ORDER BY epoch_ns(ts) DESC, event_id DESC
             ) AS rn
      FROM events
    ) t WHERE rn = 1
    """,
    survey_ids=("W5", "O4", "O5", "W4"),
    doc="Positional row slicing, the reference shapes in one tagged "
    "result: drop-first-per-sequence — dplyr::slice(-1) "
    "(R/espn_wp.R:53: drop the first WP sample of each game) — "
    "row-range slice — dplyr::slice(1:16) / t[1:24,] layout slicing "
    "(darko/2_ourlads_projections.R:157-162, R/nfl_draft_espn_dk.R:106-109) "
    "as rank-bounded filters over explicit total orders — and "
    "last-row-per-group (W4) — slice_tail() "
    "(darko/2_ourlads_projections.R:38,105): latest event per user, "
    "rank-1 over the descending order. The standalone "
    "`last_per_group` query (position 51+) keeps the single-operator "
    "form.",
)
def row_slices(spark: SparkSession, sf_dir: str) -> DataFrame:
    w_ev = Window.partitionBy("user_id").orderBy("ts_ns", "event_id")
    drop_first = (
        _events_ts_ns(spark, sf_dir)
        .select(
            F.col("user_id").cast("bigint").alias("grp"),
            F.col("event_id").cast("bigint").alias("id"),
            F.row_number().over(w_ev).alias("rn"),
        )
        .filter(F.col("rn") > 1)
        .withColumn("kind", F.lit("drop_first"))
    )
    w_cust = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    slice_range = (
        load(spark, sf_dir, "customer")
        .select(
            F.col("c_nationkey").cast("bigint").alias("grp"),
            F.col("c_custkey").cast("bigint").alias("id"),
            F.row_number().over(w_cust).alias("rn"),
        )
        .filter(F.col("rn").between(2, 4))
        .withColumn("kind", F.lit("slice_range"))
    )
    w_last = Window.partitionBy("user_id").orderBy(
        F.col("ts_ns").desc(), F.col("event_id").desc()
    )
    last_row = (
        _events_ts_ns(spark, sf_dir)
        .select(
            F.col("user_id").cast("bigint").alias("grp"),
            F.col("event_id").cast("bigint").alias("id"),
            F.row_number().over(w_last).alias("rn"),
        )
        .filter(F.col("rn") == 1)
        .withColumn("kind", F.lit("last_row"))
    )
    return drop_first.unionByName(slice_range).unionByName(last_row)


@register(
    "running_window_metrics",
    """
    SELECT event_id, user_id,
           SUM(value) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS cum_value,
           CASE WHEN SUM(CASE WHEN value > 15 THEN 1 ELSE 0 END) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts), event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) > 0 THEN 1 ELSE 0 END AS gone_big,
           CAST(COUNT(*) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts)
             RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(value AS DECIMAL(30,6))) OVER (
             PARTITION BY user_id ORDER BY epoch_ns(ts)
             RANGE BETWEEN 3600000000000 PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS sum_last_hour
    FROM events
    """,
    survey_ids=("W6", "W7", "§2.5-range"),
    doc="Running row-frame metrics + duration-based range frame in one "
    "pass. Cumsum → sticky state flag is the 'game over' flag of "
    "R/wilson_game_pass_freq.R:22-37 and the draft-odds CDF cumsum of "
    "R/nfl_draft_espn_dk.R:75-81 (prefix sums evaluate in ORDER BY "
    "order on both engines → bit-identical doubles). The trailing-hour "
    "RANGE frame (events per user in the last hour) is beyond the "
    "reference (row frames only — SURVEY §2.5) and row frames can't "
    "express it for irregular event spacing. Both frames share the "
    "user_id partitioning → one shuffle total.",
)
def running_window_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    _HOUR_NS = 3_600_000_000_000
    # µs-truncate ts so a range-frame bound landing exactly 1h from a
    # row resolves identically on both engines (DuckDB reads the
    # TIMESTAMP(NANOS) column at µs precision). Ordering is unaffected:
    # event gaps ≫ 1µs.
    e = _events_ts_ns(spark, sf_dir).withColumn(
        "ts_us", F.col("ts_ns") - F.col("ts_ns") % 1000
    )
    w_rows = (
        Window.partitionBy("user_id")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_range = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-_HOUR_NS, Window.currentRow)
    )
    big = F.when(F.col("value") > 15, 1).otherwise(0)
    return e.select(
        "event_id",
        "user_id",
        F.sum("value").over(w_rows).alias("cum_value"),
        F.when(F.sum(big).over(w_rows) > 0, 1).otherwise(0).alias("gone_big"),
        F.count("*").over(w_range).cast("bigint").alias("n_last_hour"),
        F.sum(F.col("value").cast("decimal(30,6)"))
        .over(w_range)
        .cast("double")
        .alias("sum_last_hour"),
    )


@register(
    "rank_pctile_rescale",
    """
    SELECT c_custkey AS ckey,
           c_nationkey AS nationkey,
           rank_in_nation,
           100.0 * (1 + max_rank - rank_in_nation) / max_rank AS pct_normed,
           PERCENT_RANK() OVER (
             PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey
           ) AS pctl,
           100.0 * (c_acctbal - MIN(c_acctbal) OVER wall)
             / (MAX(c_acctbal) OVER wall - MIN(c_acctbal) OVER wall)
             AS bal_scaled
    FROM (
      SELECT c_custkey, c_nationkey, c_acctbal,
             ROW_NUMBER() OVER (
               PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey
             ) AS rank_in_nation,
             COUNT(*) OVER (PARTITION BY c_nationkey) AS max_rank
      FROM customer
    ) t
    WINDOW wall AS (PARTITION BY c_nationkey)
    """,
    survey_ids=("W8", "W9", "W10"),
    doc="Rank index + percentile-from-rank + group min-max rescale, one "
    "customer-grain pass — arrange + mutate(rank=1:n()), `pct_normed = "
    "100*(1+max(rank)-rank)/max(rank)` (darko/2_ourlads_projections.R:"
    "106-113) and `100*(wr-min(wr))/max(wr-min(wr))` per season "
    "(pff/99_passblock_piece.R:43-53). All four windows share the "
    "c_nationkey partitioning → one shuffle; min/max are "
    "order-independent and the rescale is a single IEEE expression → "
    "deterministic.",
)
def rank_pctile_rescale(spark: SparkSession, sf_dir: str) -> DataFrame:
    wdesc = Window.partitionBy("c_nationkey").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey")
    )
    wasc = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    wall = Window.partitionBy("c_nationkey")
    rank = F.row_number().over(wdesc)
    max_rank = F.count("*").over(wall)
    lo, hi = F.min("c_acctbal").over(wall), F.max("c_acctbal").over(wall)
    return load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("ckey"),
        F.col("c_nationkey").alias("nationkey"),
        rank.alias("rank_in_nation"),
        (100.0 * (1 + max_rank - rank) / max_rank).alias("pct_normed"),
        F.percent_rank().over(wasc).alias("pctl"),
        (100.0 * (F.col("c_acctbal") - lo) / (hi - lo)).alias("bal_scaled"),
    )
