"""Reshape queries — SURVEY.md §2.8 (pivot_wider / pivot_longer /
unnest_wider / separate / bind_cols-by-position).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.queries import register
from nfl_data_pipeline_spark.queries.exact import dsum


@register(
    "pivot_wider",
    f"""
    WITH wide AS (
      SELECT l_returnflag,
             {dsum("CASE WHEN l_linestatus = 'F' THEN l_quantity END", "qty_f")},
             {dsum("CASE WHEN l_linestatus = 'O' THEN l_quantity END", "qty_o")},
             CAST(SUM(CASE WHEN l_linestatus = 'F' THEN 1 ELSE 0 END) AS DOUBLE)
               AS n_f,
             CAST(SUM(CASE WHEN l_linestatus = 'O' THEN 1 ELSE 0 END) AS DOUBLE)
               AS n_o
      FROM lineitem
      GROUP BY l_returnflag
    )
    SELECT l_returnflag, 'qty_f' AS measure, qty_f AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'qty_o' AS measure, qty_o AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'n_f' AS measure, n_f AS value FROM wide
    UNION ALL
    SELECT l_returnflag, 'n_o' AS measure, n_o AS value FROM wide
    """,
    survey_ids=("R2", "R1"),
    doc="pivot_wider → pivot_longer roundtrip. Wide: "
    "R/nfl_draft_espn_dk.R:42-45 (`pivot_wider(values_from=c(odds,pct), "
    "names_from=under)`): explicit pivot values (never a "
    "values-discovery scan at 100 TB), multiple measures per pivot "
    "level. The wide frame is then melted back long with Spark's "
    "native unpivot (R1 — `pivot_longer(x00:x09)` of "
    "R/preseason_predictiveness.R:18-21), so both reshape directions "
    "flow through one hashed result. The standalone `unpivot_longer` "
    "query (position 51+) keeps the single-operator form.",
)
def pivot_wider(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    piv = (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .agg(
            F.sum(F.col("l_quantity").cast("decimal(30,6)"))
            .cast("double")
            .alias("qty"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    wide = piv.select(
        "l_returnflag",
        F.col("F_qty").alias("qty_f"),
        F.col("O_qty").alias("qty_o"),
        F.col("F_n").cast("double").alias("n_f"),
        F.col("O_n").cast("double").alias("n_o"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty_f", "qty_o", "n_f", "n_o"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "unpivot_longer",
    """
    WITH wide AS (
      SELECT c_nationkey AS nationkey,
             CAST(COUNT(*) AS DOUBLE) AS n_customers,
             MAX(c_acctbal) AS max_bal,
             MIN(c_acctbal) AS min_bal
      FROM customer GROUP BY c_nationkey
    )
    SELECT nationkey, 'n_customers' AS measure, n_customers AS value FROM wide
    UNION ALL
    SELECT nationkey, 'max_bal' AS measure, max_bal AS value FROM wide
    UNION ALL
    SELECT nationkey, 'min_bal' AS measure, min_bal AS value FROM wide
    """,
    survey_ids=("R1",),
    doc="pivot_longer — R/preseason_predictiveness.R:18-21 "
    "(`pivot_longer(x00:x09)` decade columns → long). Spark 3.4+ "
    "native unpivot (melt).",
)
def unpivot_longer(spark: SparkSession, sf_dir: str) -> DataFrame:
    wide = (
        load(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(
            F.count("*").cast("double").alias("n_customers"),
            F.max("c_acctbal").alias("max_bal"),
            F.min("c_acctbal").alias("min_bal"),
        )
    )
    return wide.unpivot(
        ids=["nationkey"],
        values=["n_customers", "max_bal", "min_bal"],
        variableColumnName="measure",
        valueColumnName="value",
    )


@register(
    "separate_cols",
    """
    SELECT p_partkey AS pkey,
           SPLIT_PART(p_name, ' ', 1) AS name_first,
           SPLIT_PART(p_name, ' ', 2) AS name_last,
           UPPER(SPLIT_PART(p_name, ' ', 2)) || ', ' ||
             SPLIT_PART(p_name, ' ', 1) AS name_rebuilt
    FROM part
    """,
    survey_ids=("R4", "R5"),
    doc="separate one column into many — R/epa_predict.R:66 "
    "(`separate(player, c('f','l'), sep=' ')`) and the strsplit-matrix "
    "idiom of pff/6a_ourlads_scrape.R:39-44.",
)
def separate_cols(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part")
    nm = F.split(F.col("p_name"), " ")
    first, last = nm.getItem(0), nm.getItem(1)
    return p.select(
        F.col("p_partkey").alias("pkey"),
        first.alias("name_first"),
        last.alias("name_last"),
        F.concat(F.upper(last), F.lit(", "), first).alias("name_rebuilt"),
    )


@register(
    "unnest_wider_json",
    """
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    """,
    survey_ids=("R3", "S8"),
    doc="unnest_wider on a JSON payload — R/nfl_draft_espn_dk.R:10-11 "
    "(`unnest_wider(outcomes)`): from_json to a typed struct, then "
    "struct.* expansion.",
)
def unnest_wider_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load(spark, sf_dir, "events")
    schema = T.StructType([T.StructField("k", T.IntegerType())])
    return e.select(
        "event_id", F.from_json("props", schema).alias("j")
    ).select("event_id", F.col("j.k").alias("k"))


@register(
    "bind_cols_by_rownum",
    """
    WITH top_cust AS (
      SELECT ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey) AS rn,
             c_name AS cust_name, c_acctbal AS cust_bal
      FROM customer QUALIFY rn <= 12
    ),
    top_supp AS (
      SELECT ROW_NUMBER() OVER (ORDER BY s_acctbal DESC, s_suppkey) AS rn,
             s_name AS supp_name, s_acctbal AS supp_bal
      FROM supplier QUALIFY rn <= 7
    )
    SELECT COALESCE(c.rn, s.rn) AS rn,
           c.cust_name, c.cust_bal, s.supp_name, s.supp_bal
    FROM top_cust c FULL OUTER JOIN top_supp s ON c.rn = s.rn
    """,
    survey_ids=("J8", "R6"),
    doc="Positional bind_cols with ragged padding — "
    "R/nfc_west_starting_qbs.R:69-94 / R/nfl_draft_espn_dk.R:105-110: "
    "no native positional concat in Spark; each side gets an explicit "
    "row_number over a total order, then full-outer join on it (the "
    "shorter side pads with nulls, like the reference's blank rows).",
)
def bind_cols_by_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load(spark, sf_dir, "customer")
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("c_acctbal").desc(), F.col("c_custkey")))
            .alias("rn"),
            F.col("c_name").alias("cust_name"),
            F.col("c_acctbal").alias("cust_bal"),
        )
        .filter(F.col("rn") <= 12)
    )
    supp = (
        load(spark, sf_dir, "supplier")
        .select(
            F.row_number()
            .over(Window.orderBy(F.col("s_acctbal").desc(), F.col("s_suppkey")))
            .alias("rn"),
            F.col("s_name").alias("supp_name"),
            F.col("s_acctbal").alias("supp_bal"),
        )
        .filter(F.col("rn") <= 7)
    )
    return cust.join(supp, "rn", "full_outer").select(
        "rn", "cust_name", "cust_bal", "supp_name", "supp_bal"
    )
