"""Scalar-function surface + metric aggregations — SURVEY.md §2.9 and
A13/A14 (the 354 scalar call sites of the reference, grouped by
family) plus the odds math of R/nfl_draft_espn_dk.R.

All expressions are JVM-side built-ins (whole-stage codegen); no
Python UDFs anywhere on this path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.queries import register


@register(
    "string_funcs",
    """
    SELECT c_custkey AS ckey,
           SUBSTRING(c_name, 1, 8) AS name_prefix,
           LENGTH(c_name) AS name_len,
           UPPER(c_mktsegment) AS seg_upper,
           LOWER(c_mktsegment) AS seg_lower,
           CONCAT_WS('-', c_mktsegment, c_name) AS seg_name,
           REGEXP_REPLACE(c_name, '[0-9]+', '#', 'g') AS name_masked,
           SPLIT_PART(c_name, '#', 2) AS name_number,
           TRIM(c_name) AS name_trim,
           REPLACE(c_name, '#', '%23') AS name_url,
           SPLIT_PART(c_name, '#', 1) AS name_head,
           UPPER(SPLIT_PART(c_name, '#', 2)) || ', ' ||
             SPLIT_PART(c_name, '#', 1) AS name_rebuilt
    FROM customer
    """,
    survey_ids=("P8", "§2.9-url", "R4", "R5"),
    doc="String family — substr/str_length/str_remove/str_detect/"
    "paste0/str_split_fixed/str_squish call sites (SURVEY §2.9: "
    "R/epa_predict.R:68, R/espn_wp.R:47-48, R/nfl_draft_espn_dk.R:18-19, "
    "pff/6a_ourlads_scrape.R:31-44). DuckDB regexp_replace needs the "
    "'g' flag to match Spark's replace-all. name_url is URLencode(name) "
    "(reference R/nfl_draft_espn_dk.R:57,62) via Spark's url_encode "
    "(x-www-form-urlencoded); DuckDB 1.0 has no url_encode builtin, so "
    "the oracle spells out the encoding for the fixture charset "
    "([A-Za-z0-9#], where '#'→'%23' is the only escape). name_head / "
    "name_rebuilt are the separate-then-unite pair (R4/R5): split one "
    "column into parts, recombine in a new layout — "
    "R/epa_predict.R:66 (`separate(player, c('f','l'))`) and the "
    "strsplit-matrix idiom of pff/6a_ourlads_scrape.R:39-44. The "
    "standalone `separate_cols` query (position 51+) keeps the "
    "single-operator form on the part table.",
)
def string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("ckey"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.upper("c_mktsegment").alias("seg_upper"),
        F.lower("c_mktsegment").alias("seg_lower"),
        F.concat_ws("-", "c_mktsegment", "c_name").alias("seg_name"),
        F.regexp_replace("c_name", "[0-9]+", "#").alias("name_masked"),
        F.split(F.col("c_name"), "#").getItem(1).alias("name_number"),
        F.trim(F.col("c_name")).alias("name_trim"),
        F.url_encode(F.col("c_name")).alias("name_url"),
        F.split(F.col("c_name"), "#").getItem(0).alias("name_head"),
        F.concat(
            F.upper(F.split(F.col("c_name"), "#").getItem(1)),
            F.lit(", "),
            F.split(F.col("c_name"), "#").getItem(0),
        ).alias("name_rebuilt"),
    )


@register(
    "case_when_tiers",
    """
    SELECT tier, COUNT(*) AS n,
           CAST(SUM(is_urgent) AS BIGINT) AS n_urgent
    FROM (
      SELECT CASE WHEN o_totalprice > 300000 THEN 'high'
                  WHEN o_totalprice > 150000 THEN 'mid'
                  ELSE 'low' END AS tier,
             CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS is_urgent
      FROM orders
    ) t
    GROUP BY tier
    """,
    survey_ids=("A1", "A7"),
    doc="case_when / if_else chains — R/epa_predict.R:96-103, "
    "pff/0_scrape.R:58-67, darko/2_ourlads_projections.R:68-75.",
)
def case_when_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    tier = (
        F.when(F.col("o_totalprice") > 300000, "high")
        .when(F.col("o_totalprice") > 150000, "mid")
        .otherwise("low")
    )
    urgent = F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)
    return (
        o.select(tier.alias("tier"), urgent.alias("is_urgent"))
        .groupBy("tier")
        .agg(
            F.count("*").alias("n"),
            F.sum("is_urgent").cast("bigint").alias("n_urgent"),
        )
    )


@register(
    "odds_math",
    """
    SELECT event_id,
           odds,
           CASE WHEN odds > 0 THEN 100.0 / (odds + 100.0)
                ELSE ABS(odds) / (ABS(odds) + 100.0) END AS implied_prob,
           LN(value + 1.0) AS log1p_value,
           SQRT(ABS(value)) AS sqrt_value,
           POWER(value, 2) AS value_sq,
           GREATEST(LEAST(value, 18.0), 2.0) AS value_clamped,
           CAST(FLOOR(value / 3.0) AS BIGINT) AS value_intdiv,
           CASE WHEN value > 15 THEN 'high'
                WHEN value > 8 THEN 'mid'
                ELSE 'low' END AS value_tier
    FROM (SELECT event_id, value,
                 CAST(FLOOR(value * 10) AS BIGINT) - 100 AS odds
          FROM events) t
    """,
    survey_ids=("U6", "§2.9-case"),
    doc="American-odds → implied probability + math family + clamp — "
    "R/nfl_draft_espn_dk.R:13-26 (odds math), R/epa_predict.R:197-200 "
    "(epa clamp via if_else → greatest/least), log/abs/pow sites "
    "(SURVEY §2.9 arithmetic family). value_tier is the case_when / "
    "if_else chain family (§2.9 conditional — R/epa_predict.R:96-103, "
    "pff/0_scrape.R:58-67) riding the same projection; the standalone "
    "`case_when_tiers` query (position 51+) keeps the grouped form.",
)
def odds_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    odds = (F.floor(F.col("value") * 10)).cast("bigint") - 100
    base = e.select("event_id", "value", odds.alias("odds"))
    prob = F.when(
        F.col("odds") > 0, 100.0 / (F.col("odds") + 100.0)
    ).otherwise(F.abs(F.col("odds")) / (F.abs(F.col("odds")) + 100.0))
    return base.select(
        "event_id",
        "odds",
        prob.alias("implied_prob"),
        F.log(F.col("value") + 1.0).alias("log1p_value"),
        F.sqrt(F.abs("value")).alias("sqrt_value"),
        F.pow("value", 2).alias("value_sq"),
        F.greatest(F.least(F.col("value"), F.lit(18.0)), F.lit(2.0)).alias(
            "value_clamped"
        ),
        # R's %/% floor-division (R/let_russ_cook.R:207)
        F.floor(F.col("value") / 3.0).cast("bigint").alias("value_intdiv"),
        F.when(F.col("value") > 15, "high")
        .when(F.col("value") > 8, "mid")
        .otherwise("low")
        .alias("value_tier"),
    )


@register(
    "null_handling",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           COUNT(NULLIF(l_discount, 0.0)) AS n_discounted,
           CAST(SUM(CASE WHEN NULLIF(l_discount, 0.0) IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_disc,
           AVG(COALESCE(NULLIF(l_discount, 0.0), 0.10)) AS avg_disc_imputed,
           AVG(NULLIF(l_discount, 0.0)) AS mean_narm,
           CASE WHEN COUNT(*) != COUNT(NULLIF(l_discount, 0.0)) THEN NULL
                ELSE AVG(NULLIF(l_discount, 0.0)) END AS mean_strict
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ids=("P4", "A3"),
    doc="NULL family — is.na/!is.na/NA-coalesce "
    "(base_code.R:8, darko/2_ourlads_projections.R:83 "
    "`ifelse(is.na(value), draft_pct, value)`). The fixture has no "
    "physical nulls, so NULLIF manufactures them; COALESCE imputes "
    "back — exactly the reference's impute idiom. The last two columns "
    "are R's mean() NA semantics side-by-side (A3, "
    "R/on_off_nflreadr.R:60 mixes both in one block): mean_narm "
    "null-skips (= na.rm=TRUE, SQL AVG); mean_strict NA-propagates "
    "like bare R mean() via the r_mean shim.",
)
def null_handling(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nfl_data_pipeline_spark.functions import r_mean

    li = load(spark, sf_dir, "lineitem").withColumn(
        "disc_n", F.nullif(F.col("l_discount"), F.lit(0.0))
    )
    disc_null = F.col("disc_n")
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        F.count(disc_null).alias("n_discounted"),
        F.sum(F.when(disc_null.isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_disc"),
        F.avg(F.coalesce(disc_null, F.lit(0.10))).alias("avg_disc_imputed"),
        r_mean("disc_n", na_rm=True).alias("mean_narm"),
        r_mean("disc_n", na_rm=False).alias("mean_strict"),
    )


@register(
    "strict_sum_groups",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           SUM(CASE WHEN l_returnflag = 'N' AND l_quantity > 25 THEN NULL ELSE CAST(l_linenumber AS BIGINT) END) AS sum_narm,
           CASE WHEN COUNT(*) != COUNT(CASE WHEN l_returnflag = 'N' AND l_quantity > 25 THEN NULL ELSE 1 END) THEN NULL
                ELSE SUM(CASE WHEN l_returnflag = 'N' AND l_quantity > 25 THEN NULL ELSE CAST(l_linenumber AS BIGINT) END) END AS sum_strict,
           CASE WHEN COUNT(*) != COUNT(CASE WHEN l_returnflag = 'N' AND l_quantity > 25 THEN NULL ELSE 1 END) THEN NULL
                ELSE AVG(CASE WHEN l_returnflag = 'N' AND l_quantity > 25 THEN NULL ELSE CAST(l_linenumber AS DOUBLE) END) END AS mean_strict
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ids=("A3", "A4"),
    doc="R's STRICT aggregation defaults as oracle-gated forms "
    "(the r9 sweep: R/epa_predict.R:181-183,205-211 ya/qbs "
    "summarize blocks, wilson :40, let_russ_cook :106 — bare "
    "sum()/mean() return NA when ANY element is NA, where SQL "
    "SUM/AVG silently skip): sum_narm is SQL SUM (= na.rm=TRUE), "
    "sum_strict/mean_strict NA-propagate via the r_sum/r_mean "
    "shims. Integer-valued sums so the comparison is exact without "
    "the DECIMAL detour; NULLs manufactured in ONE group only "
    "(returnflag N, quantity > 25 — the fixture has no physical "
    "nulls) so the gate pins BOTH halves of the contract: the "
    "NULL-free groups must read strict == na.rm NON-NULL, the "
    "N group strict NULL (review fix: an every-group NULL predicate "
    "let an always-NULL strict shim pass).",
)
def strict_sum_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nfl_data_pipeline_spark.functions import r_mean, r_sum

    li = load(spark, sf_dir, "lineitem").withColumn(
        "qty_n",
        F.when(
            (F.col("l_returnflag") == "N") & (F.col("l_quantity") > 25),
            None,
        ).otherwise(F.col("l_linenumber").cast("long")),
    )
    return li.groupBy("l_returnflag").agg(
        F.count("*").alias("n"),
        r_sum("qty_n", na_rm=True).alias("sum_narm"),
        r_sum("qty_n", na_rm=False).alias("sum_strict"),
        r_mean(F.col("qty_n").cast("double"), na_rm=False).alias("mean_strict"),
    )


@register(
    "calibration_logloss",
    """
    WITH scored AS (
      SELECT LEAST(GREATEST(1.0 / (1.0 + EXP(-(value - 10.0) / 5.0)),
                            1e-9), 1.0 - 1e-9) AS p,
             CAST(user_id % 2 AS INTEGER) AS y
      FROM events
    )
    SELECT FLOOR(p * 20) / 20.0 AS bin,
           COUNT(*) AS n,
           CAST(SUM(y) AS BIGINT) AS n_wins,
           AVG(p) AS mean_p,
           AVG(CAST(y AS DOUBLE)) AS win_rate,
           AVG(-(y * LN(p) + (1 - y) * LN(1 - p))) AS logloss
    FROM scored
    GROUP BY 1
    """,
    survey_ids=("A13", "A14", "A7"),
    doc="Calibration binning + log-loss — R/espn_wp.R:87-99 "
    "(`bin = round(wp/0.01)*.01` → grouped win rates) and :236-274 "
    "(MLmetrics::LogLoss over 18 slices). Binning uses floor (exact) "
    "rather than R's banker-rounding; the r_round shim covers parity.",
)
def calibration_logloss(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    # clamp: the logistic saturates to exactly 1.0 in double for
    # value ≈ 490, and ln(1-p) would blow up (the reference's WP
    # inputs are pre-clamped upstream; we clamp explicitly).
    p = F.least(
        F.greatest(
            1.0 / (1.0 + F.exp(-(F.col("value") - 10.0) / 5.0)), F.lit(1e-9)
        ),
        F.lit(1.0 - 1e-9),
    )
    y = (F.col("user_id") % 2).cast("int")
    scored = e.select(p.alias("p"), y.alias("y"))
    yd = F.col("y").cast("double")
    return (
        scored.groupBy((F.floor(F.col("p") * 20) / 20.0).alias("bin"))
        .agg(
            F.count("*").alias("n"),
            F.sum("y").cast("bigint").alias("n_wins"),
            F.avg("p").alias("mean_p"),
            F.avg(yd).alias("win_rate"),
            F.avg(
                -(yd * F.log("p") + (1 - yd) * F.log(1.0 - F.col("p")))
            ).alias("logloss"),
        )
    )


@register(
    "map_normalize",
    """
    SELECT CASE n_name
             WHEN 'UNITED STATES' THEN 'USA'
             WHEN 'UNITED KINGDOM' THEN 'UK'
             ELSE n_name
           END AS nation_norm,
           COUNT(*) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY 1
    """,
    survey_ids=("J9",),
    doc="Name-normalization mapping before aggregation/join — the "
    "team_name_fn idiom (R/preseason_predictiveness.R:63,79,105; "
    "pff/0_scrape.R:57): a literal map applied via element_at with "
    "identity fallback, then used as a grouping key.",
)
def map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    mapping = F.create_map(
        F.lit("UNITED STATES"), F.lit("USA"),
        F.lit("UNITED KINGDOM"), F.lit("UK"),
    )
    # try_element_at: NULL (not an ANSI error) on missing key — the
    # driver's session may run with spark.sql.ansi.enabled=true
    norm = F.coalesce(F.try_element_at(mapping, F.col("n_name")), F.col("n_name"))
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select(norm.alias("nation_norm"))
        .groupBy("nation_norm")
        .agg(F.count("*").alias("n_customers"))
    )


@register(
    "ship_delay",
    """
    SELECT o.o_orderpriority,
           AVG(CAST(DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE)) AS DOUBLE))
             AS avg_ship_days,
           CAST(MAX(DATE_DIFF('day', CAST(o.o_orderdate AS DATE),
                              CAST(l.l_shipdate AS DATE))) AS BIGINT)
             AS max_ship_days
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
    survey_ids=("J2", "A2"),
    doc="Date arithmetic — lubridate::today()/game_date ops "
    "(2_scrape_new_games.R:24, R/nfc_west_starting_qbs.R:30): "
    "day-difference between order and ship dates, aggregated.",
)
def ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    dd = F.datediff(
        F.col("l_shipdate").cast("date"), F.col("o_orderdate").cast("date")
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.avg(dd.cast("double")).alias("avg_ship_days"),
            F.max(dd).cast("bigint").alias("max_ship_days"),
        )
    )
