"""Fixture-contract guard: the driver regenerates /root/testdata
between rounds, and physical details HAVE drifted under us before
(round 2: events.ts went TIMESTAMP(NANOS) → TIMESTAMP(MICROS), which
would have failed 30+ event-time queries at analysis time had
catalog.load not been re-pinned — see SCALING.md).

This test makes the next drift a loud, labeled failure at the START
of a round instead of a cryptic one deep inside a query: every
fixture table's column names and post-`catalog.load` dtypes are
asserted against the engine's canonical expectations, at every
scale factor present on disk.
"""

from __future__ import annotations

import os

import pytest

from nfl_data_pipeline_spark.catalog import FIXTURE_TABLES, load, table_path

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
        "/root/testdata/sf0.1",
    )
    if os.path.isdir(d)
]

# dtypes AFTER catalog.load normalization (events.ts is canonicalized
# to epoch-nanos bigint whatever the parquet resolution is; see
# catalog._normalize_event_time)
EXPECTED: dict[str, list[tuple[str, str]]] = {
    "region": [("r_regionkey", "int"), ("r_name", "string")],
    "nation": [
        ("n_nationkey", "int"),
        ("n_name", "string"),
        ("n_regionkey", "int"),
    ],
    "customer": [
        ("c_custkey", "bigint"),
        ("c_name", "string"),
        ("c_nationkey", "int"),
        ("c_acctbal", "double"),
        ("c_mktsegment", "string"),
    ],
    "supplier": [
        ("s_suppkey", "bigint"),
        ("s_name", "string"),
        ("s_nationkey", "int"),
        ("s_acctbal", "double"),
    ],
    "part": [
        ("p_partkey", "bigint"),
        ("p_name", "string"),
        ("p_brand", "string"),
        ("p_type", "string"),
        ("p_size", "int"),
        ("p_retailprice", "double"),
    ],
    "orders": [
        ("o_orderkey", "bigint"),
        ("o_custkey", "bigint"),
        ("o_orderstatus", "string"),
        ("o_totalprice", "double"),
        ("o_orderdate", ("timestamp", "timestamp_ntz")),
        ("o_orderpriority", "string"),
    ],
    "lineitem": [
        ("l_orderkey", "bigint"),
        ("l_partkey", "bigint"),
        ("l_suppkey", "bigint"),
        ("l_linenumber", "int"),
        ("l_quantity", "double"),
        ("l_extendedprice", "double"),
        ("l_discount", "double"),
        ("l_tax", "double"),
        ("l_returnflag", "string"),
        ("l_linestatus", "string"),
        ("l_shipdate", ("timestamp", "timestamp_ntz")),
    ],
    "events": [
        ("event_id", "bigint"),
        ("ts", "bigint"),  # ALWAYS bigint post-load, see module doc
        ("user_id", "bigint"),
        ("event_type", "string"),
        ("value", "double"),
        ("props", "string"),
    ],
    "documents": [
        ("doc_id", "bigint"),
        ("text", "string"),
        ("lang", "string"),
        ("source", "string"),
        ("n_chars", "bigint"),
    ],
    "embeddings": [
        ("vec_id", "bigint"),
        ("embedding", "array<float>"),
        ("label", "int"),
    ],
}


@pytest.mark.parametrize("sf_dir", SF_DIRS)
@pytest.mark.parametrize("name", FIXTURE_TABLES)
def test_fixture_table_contract(spark, sf_dir, name):
    if not os.path.exists(table_path(sf_dir, name)):
        pytest.skip(f"{name} absent at {sf_dir}")
    got = load(spark, sf_dir, name).dtypes
    want = EXPECTED[name]
    assert [c for c, _ in got] == [c for c, _ in want], (
        f"{sf_dir}/{name}: column drift — the driver regenerated the "
        f"fixture with different columns; update EXPECTED + every "
        f"consumer. got={got}"
    )
    for (gc, gt), (wc, wt) in zip(got, want):
        ok = gt in wt if isinstance(wt, tuple) else gt == wt
        assert ok, (
            f"{sf_dir}/{name}.{gc}: dtype drift (got {gt}, want {wt}) "
            f"— if this is a physical-format change (like round 2's "
            f"ts NANOS→MICROS), normalize it in catalog.load, NOT in "
            f"each query."
        )


def test_events_ts_is_plausible_epoch_nanos(spark):
    """Value-level guard: post-load ts must be epoch NANOseconds.
    A resolution mix-up (micros treated as nanos) shifts values by
    1000x — caught here, not as silent garbage in window queries."""
    from pyspark.sql import functions as F

    lo, hi = 1_000_000_000 * 10**9, 3_000_000_000 * 10**9  # ~2001..2065
    row = (
        load(spark, SF_DIRS[0], "events")
        .agg(F.min("ts").alias("lo"), F.max("ts").alias("hi"))
        .collect()[0]
    )
    assert lo < row["lo"] <= row["hi"] < hi, row
