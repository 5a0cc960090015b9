"""Decision-support subquery pack — correlated-subquery planner
patterns (TPC-H Q11/Q13/Q15/Q17/Q21/Q22 shapes) over the fixture
tables.

The reference never writes subqueries (dplyr composes derived frames
by hand — e.g. the grouped-summary-then-rejoin idiom of
``R/epa_predict.R:195-214`` and the global-threshold filter of
``R/on_off_nflreadr.R:59-89``), but at warehouse scale the same
intent arrives as correlated SQL. Two execution styles are covered
on purpose:

- **Catalyst decorrelation** (``scalar_subquery_avg_qty``,
  ``top_supplier_revenue``): the query is handed to ``spark.sql``
  with the correlated scalar subquery intact; Catalyst's
  ``RewriteCorrelatedScalarSubquery`` / ``RewritePredicateSubquery``
  rules turn it into an aggregate + join — no per-row re-execution,
  no cartesian. ``tests/test_subqueries.py`` asserts the rewritten
  plan shape.
- **Manual decorrelation** (``having_global_share``,
  ``cust_above_avg_segments``): the scalar aggregate is computed
  once as a 1-row DataFrame and broadcast — the idiom to reach for
  when composing DataFrame-API pipelines. At 100 TB the scalar side
  is a single-row broadcast either way; the fact table is touched
  exactly twice (once for the scalar, once for the filter), each
  pass a pruned columnar scan.

Exactness: every money-scale SUM goes through DECIMAL(30,6)
accumulation (``exact.dsum``/``davg``) so thresholds and MAX-equality
comparisons are bit-identical across engines — a float sum's merge
order would otherwise flip rows at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.queries import register
from nfl_data_pipeline_spark.queries.exact import davg, dsum

# ---------------------------------------------------------------------------
# Q17 shape — correlated scalar subquery against the outer row's group.
# ---------------------------------------------------------------------------

_Q17_SQL = f"""
    SELECT p.p_brand,
           CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(30,6))) AS DOUBLE) / 7.0
                AS DOUBLE) AS avg_yearly
    FROM {{lineitem}} l
    JOIN {{part}} p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#11', 'Brand#12', 'Brand#13')
      AND l.l_quantity < (
            SELECT 0.2 * CAST(SUM(CAST(l2.l_quantity AS DECIMAL(30,6))) AS DOUBLE)
                       / COUNT(l2.l_quantity)
            FROM {{lineitem}} l2
            WHERE l2.l_partkey = l.l_partkey)
    GROUP BY p.p_brand
"""


@register(
    "scalar_subquery_avg_qty",
    _Q17_SQL.format(lineitem="lineitem", part="part"),
    survey_ids=("J2", "A4", "P1"),
    doc="TPC-H-Q17-shaped small-quantity revenue: per-part average "
    "threshold as a correlated scalar subquery, decorrelated by "
    "Catalyst into a partial-agg + join (no per-row re-execution). "
    "Mirrors the grouped-mean-then-filter idiom of "
    "R/epa_predict.R:195-214 expressed as SQL a warehouse user would "
    "write.",
)
def scalar_subquery_avg_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("sq17_lineitem")
    load(spark, sf_dir, "part").createOrReplaceTempView("sq17_part")
    return spark.sql(_Q17_SQL.format(lineitem="sq17_lineitem", part="sq17_part"))


# ---------------------------------------------------------------------------
# Q11 shape — HAVING against a global scalar aggregate (manual broadcast).
# ---------------------------------------------------------------------------

_SHARE_CUTOFF = 0.0005


@register(
    "having_global_share",
    f"""
    SELECT l_partkey,
           {dsum("l_extendedprice * (1 - l_discount)", "part_value")}
    FROM lineitem
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))) AS DOUBLE)
         > (SELECT CAST(SUM(CAST((l_extendedprice * (1 - l_discount)) AS DECIMAL(30,6))) AS DOUBLE)
                   * {_SHARE_CUTOFF}
            FROM lineitem)
    """,
    survey_ids=("A1", "A10"),
    doc="TPC-H-Q11-shaped global-share HAVING: parts holding more "
    "than a fixed fraction of total discounted revenue. The global "
    "total is computed once (1-row DataFrame) and broadcast into the "
    "filter — the manual-decorrelation idiom for DataFrame pipelines; "
    "the fact table is scanned twice, both scans column-pruned to 3 "
    "columns. Threshold comparison is exact via DECIMAL sums.",
)
def having_global_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    value = F.expr(dsum("l_extendedprice * (1 - l_discount)", "part_value"))
    total = li.agg(
        (
            F.expr(dsum("l_extendedprice * (1 - l_discount)", "t"))
            * F.lit(_SHARE_CUTOFF)
        ).alias("cutoff")
    )
    return (
        li.groupBy("l_partkey")
        .agg(value)
        .join(F.broadcast(total))
        .filter(F.col("part_value") > F.col("cutoff"))
        .select("l_partkey", "part_value")
    )


# ---------------------------------------------------------------------------
# Q13 shape — count distribution over a filtered left outer join.
# ---------------------------------------------------------------------------


@register(
    "custdist",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
        FROM customer c
        LEFT JOIN orders o
          ON c.c_custkey = o.o_custkey
         AND o.o_orderpriority <> '1-URGENT'
        GROUP BY c.c_custkey
    ) per_cust
    GROUP BY c_count
    """,
    survey_ids=("J1", "A2"),
    doc="TPC-H-Q13-shaped customer order-count distribution: the "
    "join filter lives in the LEFT JOIN's ON clause (not WHERE — "
    "moving it would silently drop zero-order customers), then a "
    "two-level aggregation. COUNT(col) counts only matched rows, so "
    "unmatched customers land in the c_count=0 bucket. All-integer "
    "output, exact by construction.",
)
def custdist(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count("*").alias("custdist"))


# ---------------------------------------------------------------------------
# Q15 shape — equality against a MAX scalar subquery over a shared CTE.
# ---------------------------------------------------------------------------

_Q15_SQL = f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {dsum("l_extendedprice * (1 - l_discount)", "total_revenue")}
        FROM {{lineitem}}
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_revenue
    FROM {{supplier}} s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
"""


@register(
    "top_supplier_revenue",
    _Q15_SQL.format(lineitem="lineitem", supplier="supplier"),
    survey_ids=("J5", "A1", "O1"),
    doc="TPC-H-Q15-shaped top supplier: quarterly revenue CTE reused "
    "by both the join and the MAX scalar subquery; Catalyst computes "
    "the 1-row MAX and broadcasts it into the filter. Equality "
    "against the MAX is safe only because revenue is DECIMAL-exact — "
    "a float sum would make 'equal to the max' engine-dependent.",
)
def top_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("sq15_lineitem")
    load(spark, sf_dir, "supplier").createOrReplaceTempView("sq15_supplier")
    return spark.sql(
        _Q15_SQL.format(lineitem="sq15_lineitem", supplier="sq15_supplier")
    )


# ---------------------------------------------------------------------------
# Q21 shape — correlated EXISTS + correlated NOT EXISTS with an
# inequality on the outer row (semi + anti join with residual condition).
# ---------------------------------------------------------------------------


@register(
    "exists_returned_not_late",
    """
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
            SELECT 1 FROM lineitem l
            WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
      AND NOT EXISTS (
            SELECT 1 FROM lineitem l2
            WHERE l2.l_orderkey = o.o_orderkey
              AND l2.l_shipdate > o.o_orderdate + INTERVAL 90 DAY)
    GROUP BY o.o_orderpriority
    """,
    survey_ids=("J10", "A2"),
    doc="TPC-H-Q21-shaped order screen: orders with at least one "
    "returned line and no line shipped more than 90 days after the "
    "order date. The NOT EXISTS correlates on BOTH an equi-key and an "
    "inequality against the outer row — it becomes a left-anti hash "
    "join with a residual (non-equi) condition, not a cartesian. "
    "Expressed with the DataFrame API (semi + anti) to pin that plan.",
)
def exists_returned_not_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    returned = li.filter(F.col("l_returnflag") == "R").select("l_orderkey")
    late = li.select("l_orderkey", "l_shipdate")
    screened = orders.join(
        returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
    ).join(
        late,
        (orders.o_orderkey == late.l_orderkey)
        & (late.l_shipdate > orders.o_orderdate + F.expr("INTERVAL 90 DAYS")),
        "left_anti",
    )
    return screened.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


# ---------------------------------------------------------------------------
# Q22 shape — global-average threshold + correlated NOT EXISTS.
# ---------------------------------------------------------------------------


@register(
    "cust_above_avg_segments",
    f"""
    SELECT c_mktsegment,
           COUNT(*) AS numcust,
           {dsum("c_acctbal", "totacctbal")}
    FROM customer c
    WHERE c.c_acctbal > (
            SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(30,6))) AS DOUBLE)
                   / COUNT(c_acctbal)
            FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (
            SELECT 1 FROM orders o
            WHERE o.o_custkey = c.c_custkey
              AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    survey_ids=("J10", "A1", "A2"),
    doc="TPC-H-Q22-shaped segment report: customers with an account "
    "balance above the positive-balance average and no urgent orders, "
    "rolled up per market segment. Spark side decorrelates by hand: "
    "the 1-row average is broadcast into the filter, the NOT EXISTS "
    "is a left-anti join on the pre-filtered orders side. The "
    "threshold average is DECIMAL-exact so the > cut is bit-identical "
    "across engines.",
)
def cust_above_avg_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    avg_row = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.expr(davg("c_acctbal", "avg_bal"))
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select(
        "o_custkey"
    )
    return (
        cust.join(F.broadcast(avg_row))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("numcust"), F.expr(dsum("c_acctbal", "totacctbal")))
    )
