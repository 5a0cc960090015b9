"""Plan-shape assertions for the decision-support subquery pack
(queries/subqueries.py): correlated subqueries must decorrelate into
aggregate+join plans — never per-row re-execution, never a cartesian
over the fact table. These are the properties that keep the queries
viable at 100 TB.
"""

from __future__ import annotations

import pytest

from tests.test_plan_shape import plan_of


def test_correlated_scalar_subquery_decorrelates(spark):
    """Q17 shape: Catalyst rewrites the correlated per-part average
    into a partial aggregate joined back on l_partkey."""
    plan = plan_of(spark, "scalar_subquery_avg_qty")
    assert "CartesianProduct" not in plan
    # the subquery's aggregate materializes as a join on the
    # correlation key, not a nested-loop re-execution per outer row
    assert plan.count("HashAggregate") >= 2
    assert "Join" in plan


def test_max_scalar_subquery_is_broadcast(spark):
    """Q15 shape: the 1-row MAX(total_revenue) arrives as a scalar
    subquery result, not a shuffled join side."""
    plan = plan_of(spark, "top_supplier_revenue")
    assert "CartesianProduct" not in plan
    assert "Subquery" in plan or "BroadcastExchange" in plan


def test_global_share_scalar_broadcasts(spark):
    """Q11 shape (manual decorrelation): the global-total cutoff is a
    1-row broadcast side, and both lineitem scans are pruned to the
    three columns the query touches."""
    plan = plan_of(spark, "having_global_share")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "l_orderkey" not in line
            assert "l_quantity" not in line


def test_exists_pack_uses_semi_and_anti(spark):
    """Q21 shape: EXISTS → left-semi, correlated NOT EXISTS with an
    outer-row inequality → left-anti hash join with residual
    condition. A cartesian or nested-loop here would be quadratic in
    lineitem."""
    plan = plan_of(spark, "exists_returned_not_late")
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_cust_above_avg_anti_join_broadcasts(spark):
    """Q22 shape: the urgent-orders NOT EXISTS side is small after
    its filter — it must broadcast, keeping customer un-shuffled."""
    plan = plan_of(spark, "cust_above_avg_segments")
    assert "LeftAnti" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan


def test_custdist_join_filter_stays_in_on_clause(spark):
    """Q13 shape: the priority filter must ride the join (ON clause)
    so zero-order customers survive into the c_count=0 bucket; the
    orders scan still gets the <> pushed down as a data filter."""
    plan = plan_of(spark, "custdist")
    assert "CartesianProduct" not in plan
    # two-level aggregation: per-customer count, then distribution
    assert plan.count("HashAggregate") >= 3


def test_table_profile_exact_and_approx_dial(spark):
    """The one-scan profiler: exact dial matches a per-column
    recompute; approx dial (the 100-TB path — no Expand) stays
    within HLL error and keeps nulls/min/max identical."""
    from nfl_data_pipeline_spark.queries.extra import table_profile

    df = spark.createDataFrame(
        [(i % 7 if i % 5 else None, f"s{i % 3}") for i in range(200)],
        "a int, b string",
    )
    prof = {
        r["col"]: r
        for r in table_profile(df, ("a",), ("b",)).collect()
    }
    assert prof["a"]["n_null"] == 40 and prof["a"]["n_distinct"] == 7
    assert prof["a"]["min_num"] == 0.0 and prof["a"]["max_num"] == 6.0
    assert prof["b"]["n_distinct"] == 3 and prof["b"]["min_str"] == "s0"
    approx = {
        r["col"]: r
        for r in table_profile(df, ("a",), ("b",), exact=False).collect()
    }
    for c in ("a", "b"):
        assert approx[c]["n_null"] == prof[c]["n_null"]
        assert abs(approx[c]["n_distinct"] - prof[c]["n_distinct"]) <= 1
    # the approx plan must not contain the Expand the exact one needs
    exact_plan = (
        table_profile(df, ("a",), ("b",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    approx_plan = (
        table_profile(df, ("a",), ("b",), exact=False)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" in exact_plan and "Expand" not in approx_plan


def test_table_profile_binary_and_array_columns(spark):
    """Non-scalar column contract: distinct via xxhash64 (nulls
    excluded), byte-length / cardinality stats in the num slots,
    value-order stats explicitly NULL; the approx dial stays
    Expand-free with payload classes in the mix."""
    from nfl_data_pipeline_spark.queries.extra import table_profile

    df = spark.createDataFrame(
        [
            ("ab", [1.0, 2.0]),
            ("ab", [1.0, 2.0]),
            ("wxyz", [3.0]),
            (None, None),
        ],
        "s string, arr array<double>",
    ).selectExpr("CAST(s AS BINARY) AS payload", "arr")
    prof = {
        r["col"]: r
        for r in table_profile(
            df, (), (), bin_cols=("payload",), arr_cols=("arr",)
        ).collect()
    }
    p = prof["payload"]
    assert p["n_null"] == 1
    assert p["n_distinct"] == 2  # hash-distinct excludes the NULL
    assert (p["min_num"], p["max_num"]) == (2.0, 4.0)  # byte lengths
    assert p["avg_num"] == pytest.approx((2 + 2 + 4) / 3)
    assert p["min_str"] is None and p["max_str"] is None
    a = prof["arr"]
    assert a["n_null"] == 1 and a["n_distinct"] == 2
    assert (a["min_num"], a["max_num"]) == (1.0, 2.0)  # cardinality
    assert a["avg_num"] == pytest.approx((2 + 2 + 1) / 3)
    approx_plan = (
        table_profile(
            df, (), (), bin_cols=("payload",), arr_cols=("arr",),
            exact=False,
        )
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Expand" not in approx_plan
