"""Relational core queries — SURVEY.md §2.1-2.4, §2.7 (scans,
filters/projections, joins, aggregations, set ops).

Each query mirrors an operator family the reference exercises (R
dplyr verbs over SQLite / in-memory frames, cited per query) but is
expressed as an idiomatic Catalyst plan: filters and projections sit
directly on the parquet scan (pushdown + pruning), small dimensions
are broadcast, aggregates are partial-aggregated map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.queries import register
from nfl_data_pipeline_spark.queries.exact import davg, dsum

# ---------------------------------------------------------------------------
# Scan + filter + project + hash-agg — the reference's canonical query shape
# (`R/let_russ_cook.R:40-44,104-107`): filter plays, select cols, grouped mean.
# ---------------------------------------------------------------------------


@register(
    "pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           {dsum("l_quantity", "sum_qty")},
           {dsum("l_extendedprice", "sum_base_price")},
           {dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")},
           {dsum("l_extendedprice * (1 - l_discount) * (1 + l_tax)", "sum_charge")},
           {davg("l_quantity", "avg_qty")},
           {davg("l_extendedprice", "avg_price")},
           {davg("l_discount", "avg_disc")},
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    survey_ids=("S1", "S6", "P1", "P5", "A1", "A2", "A4", "A8"),
    doc="TPC-H-Q1-shaped pricing summary: the multi-metric agg block "
    "pattern of R/on_off_nflreadr.R:59-89 on the lineitem fixture.",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(dsum("l_quantity", "sum_qty")),
            F.expr(dsum("l_extendedprice", "sum_base_price")),
            F.expr(dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")),
            F.expr(
                dsum(
                    "l_extendedprice * (1 - l_discount) * (1 + l_tax)",
                    "sum_charge",
                )
            ),
            F.expr(davg("l_quantity", "avg_qty")),
            F.expr(davg("l_extendedprice", "avg_price")),
            F.expr(davg("l_discount", "avg_disc")),
            F.count("*").alias("count_order"),
        )
    )


@register(
    "filter_project",
    """
    SELECT o_orderkey AS okey,
           o_custkey AS ckey,
           o_totalprice AS total,
           o_orderpriority AS priority
    FROM orders
    WHERE o_orderstatus IN ('F', 'O')
      AND o_totalprice BETWEEN 1000 AND 400000
      AND o_orderpriority LIKE '%URGENT%'
      AND o_orderdate IS NOT NULL
    """,
    survey_ids=("P1", "P2", "P4", "P5", "P6", "P7", "P8"),
    doc="Filter stack + select-with-rename: the lazy filter/select "
    "prefix of R/let_russ_cook.R:41-43 (comparisons, between, %in%, "
    "string predicate, null guard). All predicates push to the scan.",
)
def filter_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.filter(
            F.col("o_orderstatus").isin("F", "O")
            & F.col("o_totalprice").between(1000, 400000)
            & F.col("o_orderpriority").contains("URGENT")
            & F.col("o_orderdate").isNotNull()
        )
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_custkey").alias("ckey"),
            F.col("o_totalprice").alias("total"),
            F.col("o_orderpriority").alias("priority"),
        )
    )


# ---------------------------------------------------------------------------
# Joins
# ---------------------------------------------------------------------------


@register(
    "revenue_by_nation",
    f"""
    SELECT n.n_name AS nation, r.r_name AS region,
           {dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")},
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
    survey_ids=("J2", "J3", "J5"),
    doc="Chained multi-source equi-joins with broadcast dims — the "
    "5-join QB panel build of R/epa_predict.R:215-219. nation/region "
    "are the 32-row teams-table analog (J5): explicitly broadcast.",
)
def revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(
            F.expr(dsum("l_extendedprice * (1 - l_discount)", "revenue")),
            F.count("*").alias("n_items"),
        )
    )


@register(
    "left_join_null_audit",
    """
    SELECT 'no_big_order' AS kind,
           CAST(c.c_custkey AS BIGINT) AS key_id,
           c.c_name AS name,
           CAST(NULL AS BIGINT) AS n_customers,
           CAST(NULL AS BIGINT) AS n_suppliers
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_totalprice > 350000) o
      ON c.c_custkey = o.o_custkey
    WHERE o.o_orderkey IS NULL
    UNION ALL
    SELECT 'nation_counts' AS kind,
           CAST(COALESCE(cust.nationkey, supp.nationkey) AS BIGINT) AS key_id,
           CAST(NULL AS VARCHAR) AS name,
           cust.n_customers AS n_customers,
           supp.n_suppliers AS n_suppliers
    FROM (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ) cust
    FULL OUTER JOIN (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    ) supp ON cust.nationkey = supp.nationkey
    """,
    survey_ids=("J1", "P10", "J4"),
    doc="Join-audit pack, two tagged legs. 'no_big_order': left join + "
    "is-null audit — the join-integrity pattern of "
    "R/epa_predict.R:229-238 (`filter(is.na(qbr))`): customers with "
    "no large order, expressed exactly as the reference writes it. "
    "'nation_counts': full_join of two aggregates — "
    "pff/99_passblock_piece.R:71 (`full_join(pff, by=c('season',"
    "'posteam'))`); nulls on either side surface exactly as R's NA "
    "rows do (J4). The standalone `full_outer_join` query (position "
    "51+) keeps the single-operator form.",
)
def left_join_null_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    audit = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .filter(F.col("o_orderkey").isNull())
        .select(
            F.lit("no_big_order").alias("kind"),
            F.col("c_custkey").cast("bigint").alias("key_id"),
            F.col("c_name").alias("name"),
            F.lit(None).cast("bigint").alias("n_customers"),
            F.lit(None).cast("bigint").alias("n_suppliers"),
        )
    )
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    # USING-join in Spark already coalesces the key column.
    nation_counts = cust.join(supp, "nationkey", "full_outer").select(
        F.lit("nation_counts").alias("kind"),
        F.col("nationkey").cast("bigint").alias("key_id"),
        F.lit(None).cast("string").alias("name"),
        "n_customers",
        "n_suppliers",
    )
    return audit.unionByName(nation_counts)


@register(
    "semi_anti_join",
    """
    SELECT c_custkey AS custkey, c_name AS name, 'semi' AS kind
    FROM customer c
    WHERE EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
    )
    UNION ALL
    SELECT c_custkey AS custkey, c_name AS name, 'anti' AS kind
    FROM customer c
    WHERE NOT EXISTS (
      SELECT 1 FROM orders o
      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 350000
    )
    """,
    survey_ids=("J10", "P10", "S4"),
    doc="left_semi + left_anti in one tagged result (SURVEY §2.3 J10; "
    "P10 membership audit). The anti leg is the core of the "
    "incremental-append job (2_scrape_new_games.R:7-12: append only "
    "games not already present); the semi leg is the Spark-native "
    "EXISTS filter the reference approximates with joins.",
)
def semi_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    proj = [F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name")]
    o_f = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    semi = (
        c.join(o_f, c.c_custkey == o_f.o_custkey, "left_semi")
        .select(*proj)
        .withColumn("kind", F.lit("semi"))
    )
    o_big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 350000)
    anti = (
        c.join(o_big, c.c_custkey == o_big.o_custkey, "left_anti")
        .select(*proj)
        .withColumn("kind", F.lit("anti"))
    )
    return semi.unionByName(anti)


@register(
    "full_outer_join",
    """
    WITH cust AS (
      SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      FROM customer GROUP BY c_nationkey
    ),
    supp AS (
      SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
           cust.n_customers AS n_customers,
           supp.n_suppliers AS n_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
    survey_ids=("J4",),
    doc="full_join of two aggregates — pff/99_passblock_piece.R:71 "
    "(`full_join(pff, by=c('season','posteam'))`). Nulls on either "
    "side surface exactly as R's NA rows do.",
)
def full_outer_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_customers"))
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").alias("n_suppliers"))
    )
    joined = cust.join(supp, "nationkey", "full_outer")
    # USING-join in Spark already coalesces the key column.
    return joined.select("nationkey", "n_customers", "n_suppliers")


@register(
    "cross_join",
    """
    SELECT r.r_name AS region, n.n_name AS nation
    FROM region r CROSS JOIN nation n
    """,
    survey_ids=("J6", "S12"),
    doc="Cross join — the scrape work-plan generator "
    "expand.grid(seasons × weeks) of pff/0_scrape.R:36-41.",
)
def cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    r = load(spark, sf_dir, "region").select(F.col("r_name").alias("region"))
    n = load(spark, sf_dir, "nation").select(F.col("n_name").alias("nation"))
    return r.crossJoin(n)


@register(
    "union_all_ragged",
    """
    SELECT c_custkey AS entity_key, c_name AS entity_name,
           c_acctbal AS acctbal, 'customer' AS side
    FROM customer
    UNION ALL
    SELECT s_suppkey AS entity_key, s_name AS entity_name,
           NULL AS acctbal, 'supplier' AS side
    FROM supplier
    UNION ALL
    SELECT CAST(r.r_regionkey AS BIGINT) * 1000 + n.n_nationkey AS entity_key,
           r.r_name || '/' || n.n_name AS entity_name,
           NULL AS acctbal, 'grid' AS side
    FROM region r CROSS JOIN nation n
    """,
    survey_ids=("J7", "J6", "S12"),
    doc="bind_rows with ragged columns — R/preseason_predictiveness.R:71-74 "
    "self-union of home/away legs; unionByName(allowMissingColumns=True) "
    "fills the missing column with nulls exactly as bind_rows does. "
    "Third leg: a cross-join work-plan grid (J6/S12) — the scrape "
    "expand.grid(seasons × weeks) generator of pff/0_scrape.R:36-41, "
    "bound into the same ragged union. The standalone `cross_join` "
    "query (position 51+) keeps the single-operator form.",
)
def union_all_ragged(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.col("c_acctbal").alias("acctbal"),
        F.lit("customer").alias("side"),
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("side"),
    )
    r = load(spark, sf_dir, "region")
    n = load(spark, sf_dir, "nation")
    grid = r.crossJoin(n).select(
        (F.col("r_regionkey").cast("bigint") * 1000 + F.col("n_nationkey")).alias(
            "entity_key"
        ),
        F.concat(F.col("r_name"), F.lit("/"), F.col("n_name")).alias("entity_name"),
        F.lit("grid").alias("side"),
    )
    return c.unionByName(s, allowMissingColumns=True).unionByName(
        grid, allowMissingColumns=True
    )


# ---------------------------------------------------------------------------
# Aggregations
# ---------------------------------------------------------------------------


@register(
    "distinct_pairs",
    "SELECT DISTINCT o_custkey AS custkey, o_orderstatus AS status FROM orders",
    survey_ids=("A9",),
    doc="distinct — 2_scrape_new_games.R:17-18 "
    "(`select(game_id) %>% distinct()`).",
)
def distinct_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .select(F.col("o_custkey").alias("custkey"), F.col("o_orderstatus").alias("status"))
        .distinct()
    )


@register(
    "conditional_agg",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(SUM(CASE WHEN value > 10 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
           AVG(CASE WHEN user_id % 2 = 0 THEN 1.0 ELSE 0.0 END) AS even_rate,
           MIN(value) AS min_value,
           MAX(value) AS max_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    GROUP BY event_type
    """,
    survey_ids=("A6", "A7", "A9"),
    doc="Conditional count + min/max + COUNT DISTINCT — R/espn_wp.R:95-99 "
    "(`n_wins = length(which(label == 1))`), grouped min/max "
    "(pff/99_passblock_piece.R:45-48), and distinct-aggregation (A9, "
    "Spark's two-phase distinct-agg expansion).",
)
def conditional_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("value") > 10, 1).otherwise(0)).cast("bigint").alias("n_big"),
        F.avg(F.when(F.col("user_id") % 2 == 0, 1.0).otherwise(0.0)).alias("even_rate"),
        F.min("value").alias("min_value"),
        F.max("value").alias("max_value"),
        F.count_distinct(F.col("user_id")).alias("n_users"),
    )


@register(
    "grouped_mutate_share",
    """
    SELECT o_orderkey AS okey,
           o_custkey AS ckey,
           o_totalprice / SUM(o_totalprice) OVER (PARTITION BY o_custkey)
             AS cust_share,
           COUNT(*) OVER (PARTITION BY o_custkey) AS cust_orders
    FROM orders
    """,
    survey_ids=("A10",),
    doc="Grouped mutate (aggregate broadcast back to rows) — "
    "R/preseason_predictiveness.R:54-56 / R/let_russ_cook.R:26-28 "
    "(`group_by(...) %>% mutate(tot = sum(x))`). Per-customer "
    "partitions are tiny, so plain double sums are deterministic "
    "enough (<1e-11 error) without the decimal detour.",
)
def grouped_mutate_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = Window.partitionBy("o_custkey")
    return load(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.col("o_custkey").alias("ckey"),
        (F.col("o_totalprice") / F.sum("o_totalprice").over(w)).alias("cust_share"),
        F.count("*").over(w).alias("cust_orders"),
    )


@register(
    "corr_by_group",
    """
    SELECT l_returnflag,
           CORR(l_quantity, l_extendedprice) AS corr_qty_price,
           CORR(l_discount, l_tax) AS corr_disc_tax
    FROM lineitem
    GROUP BY l_returnflag
    """,
    survey_ids=("A11",),
    doc="Pairwise correlation — the 26-cell corr tables of "
    "R/epa_predict.R:270-292 (`cor(use='complete.obs')`; both engines "
    "null-skip pairwise).",
)
def corr_by_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.corr("l_quantity", "l_extendedprice").alias("corr_qty_price"),
            F.corr("l_discount", "l_tax").alias("corr_disc_tax"),
        )
    )


@register(
    "corr_grid_stacked",
    """
    WITH panel AS (
      SELECT o_custkey,
             o_totalprice AS price,
             CAST(DATEDIFF('day', DATE '1992-01-01', o_orderdate) AS DOUBLE) AS odays,
             CAST(7 AS DOUBLE) AS ship_const,
             LAG(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS lag_price,
             LAG(CAST(DATEDIFF('day', DATE '1992-01-01', o_orderdate) AS DOUBLE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS lag_odays,
             LAG(CAST(7 AS DOUBLE)) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey) AS lag_ship
      FROM orders
    ), cells AS (
      SELECT CORR(price, lag_price) AS s0, CORR(price, lag_price) AS e0,
             COUNT(CASE WHEN price IS NOT NULL AND lag_price IS NOT NULL THEN 1 END) AS n0,
             CORR(odays, lag_odays) AS s1, CORR(price, lag_odays) AS e1,
             COUNT(CASE WHEN odays IS NOT NULL AND lag_odays IS NOT NULL THEN 1 END) AS n1,
             CORR(ship_const, lag_ship) AS s2, CORR(price, lag_ship) AS e2,
             COUNT(CASE WHEN ship_const IS NOT NULL AND lag_ship IS NOT NULL THEN 1 END) AS n2
      FROM panel
    )
    SELECT 'price' AS metric, s0 AS stability, e0 AS vs_price, n0 AS n_pairs FROM cells
    UNION ALL SELECT 'order_age', s1, e1, n1 FROM cells
    UNION ALL SELECT 'ship_const', s2, e2, n2 FROM cells
    """,
    survey_ids=("A11", "W1"),
    doc="The reference's metric-by-lag correlation GRID as one "
    "aggregation stacked long (R/epa_predict.R:270-292 t / :437 t2 "
    "tables; plans/epa_panel._corr_grid is the domain twin): lag "
    "panel per entity ordered by time, every (stability, "
    "cross-vs-target, n_pairs) cell computed in a single scan, then "
    "laid out one row per metric via stack(). The ship_const row "
    "pins the zero-variance edge: R cor is NA, Spark corr is NaN -> "
    "NULL (nanvl), DuckDB corr is NULL natively.",
)
def corr_grid_stacked(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    w = "PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
    age = "CAST(datediff(o_orderdate, DATE '1992-01-01') AS DOUBLE)"
    panel = o.selectExpr(
        "o_totalprice AS price",
        f"{age} AS odays",
        "CAST(7 AS DOUBLE) AS ship_const",
        f"LAG(o_totalprice) OVER ({w}) AS lag_price",
        f"LAG({age}) OVER ({w}) AS lag_odays",
        f"LAG(CAST(7 AS DOUBLE)) OVER ({w}) AS lag_ship",
    )
    rows_spec = [
        ("price", "price", "lag_price"),
        ("order_age", "odays", "lag_odays"),
        ("ship_const", "ship_const", "lag_ship"),
    ]
    aggs = []
    for i, (_, cur, lag) in enumerate(rows_spec):
        aggs += [
            F.nanvl(F.corr(cur, lag), F.lit(None).cast("double")).alias(f"_s{i}"),
            F.nanvl(F.corr("price", lag), F.lit(None).cast("double")).alias(f"_e{i}"),
            F.count(F.when(F.col(cur).isNotNull() & F.col(lag).isNotNull(), 1))
            .cast("bigint")
            .alias(f"_n{i}"),
        ]
    cells = ", ".join(
        f"'{lbl}', _s{i}, _e{i}, _n{i}" for i, (lbl, _, _) in enumerate(rows_spec)
    )
    return panel.agg(*aggs).selectExpr(
        f"stack({len(rows_spec)}, {cells})"
        " as (metric, stability, vs_price, n_pairs)"
    )


@register(
    "quantiles",
    """
    SELECT o_orderpriority,
           QUANTILE_CONT(o_totalprice, 0.2) AS p20,
           QUANTILE_CONT(o_totalprice, 0.5) AS p50,
           QUANTILE_CONT(o_totalprice, 0.8) AS p80
    FROM orders
    GROUP BY o_orderpriority
    """,
    survey_ids=("A12",),
    doc="Exact interpolated quantiles — darko/2_ourlads_projections.R:508-524 "
    "(`quantile(probs=c(.2,.5,.8))`, R type-7 = linear interpolation, "
    "same as Spark `percentile` / DuckDB `quantile_cont`).",
)
def quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.percentile("o_totalprice", 0.2).alias("p20"),
            F.percentile("o_totalprice", 0.5).alias("p50"),
            F.percentile("o_totalprice", 0.8).alias("p80"),
        )
    )


@register(
    "first_last_ordered",
    """
    SELECT DISTINCT o_custkey AS ckey,
           FIRST_VALUE(o_orderpriority) OVER w AS first_priority,
           LAST_VALUE(o_orderpriority) OVER w AS last_priority
    FROM orders
    WINDOW w AS (
      PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
    )
    """,
    survey_ids=("A5",),
    doc="Ordered first/last per group — dplyr::first(game_date) "
    "(R/nfc_west_starting_qbs.R:30) / dplyr::last (darko:88). The "
    "reference relies on silent row order; we order explicitly by "
    "(orderdate, orderkey) — SURVEY §7 hard-part 1.",
)
def first_last_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return (
        load(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").alias("ckey"),
            F.first("o_orderpriority").over(w).alias("first_priority"),
            F.last("o_orderpriority").over(w).alias("last_priority"),
        )
        .distinct()
    )


@register(
    "sort_limit_topk",
    """
    SELECT o_orderkey AS okey, o_totalprice AS total, o_orderpriority AS priority
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    survey_ids=("O1", "O2", "O3"),
    doc="Multi-key sort + top-k — 2_scrape_new_games.R:16-22 tail(5) / "
    "darko top-20 report. The reference's tail() relies on insertion "
    "order; we order totally (price desc, key asc) so the row set is "
    "deterministic. Spark executes this as TakeOrderedAndProject (no "
    "full sort).",
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
        .select(
            F.col("o_orderkey").alias("okey"),
            F.col("o_totalprice").alias("total"),
            F.col("o_orderpriority").alias("priority"),
        )
    )


@register(
    "date_parts_agg",
    """
    SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INTEGER) AS order_year,
           CAST(EXTRACT(MONTH FROM o_orderdate) AS INTEGER) AS order_month,
           COUNT(*) AS n_orders,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_finished
    FROM orders
    GROUP BY 1, 2
    """,
    survey_ids=("A1", "A7"),
    doc="Date-part extraction + grouped counts — the per-season/per-week "
    "count sanity queries of 1_rebuild_db.R:39-50 over a date axis.",
)
def date_parts_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").alias("order_year"),
            F.month("o_orderdate").alias("order_month"),
        )
        .agg(
            F.count("*").alias("n_orders"),
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0))
            .cast("bigint")
            .alias("n_finished"),
        )
    )


@register(
    "json_extract_agg",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT)
             AS sum_k,
           COUNT(*) AS n
    FROM events
    GROUP BY event_type
    """,
    survey_ids=("S8", "R3"),
    doc="JSON field extraction — jsonlite::fromJSON + pluck "
    "(R/espn_wp.R:41-44, R/nfl_draft_espn_dk.R:6-11): pull `$.k` out "
    "of the props JSON string and aggregate it.",
)
def json_extract_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    return e.groupBy("event_type").agg(
        F.sum(F.get_json_object("props", "$.k").cast("int")).cast("bigint").alias("sum_k"),
        F.count("*").alias("n"),
    )
