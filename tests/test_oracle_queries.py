"""Differential oracle tests — every registered query runs on Spark
and on DuckDB at sf0.01 and must match (row count + column names +
canonicalized values). This mirrors the driver's CORRECTNESS gate.
"""

from __future__ import annotations

import pytest

from nfl_data_pipeline_spark.queries import all_queries
from tests.conftest import SF_CORRECT, SF_SMOKE, assert_query_matches_oracle

SPECS = list(all_queries().values())


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_matches_oracle(spec, spark, duck):
    if spec.oracle is None:
        df = spec.spark(spark, SF_CORRECT)
        assert df.count() >= 0  # rows-only check, like the driver
    else:
        assert_query_matches_oracle(spec, spark, duck, SF_CORRECT)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    names = set(e.queries())
    assert set(e.oracle_sql()) <= names


@pytest.mark.parametrize("spec", SPECS, ids=[s.name for s in SPECS])
def test_query_runs_at_smoke_sf(spec, spark):
    # schema stability at a second scale factor
    df = spec.spark(spark, SF_SMOKE)
    assert df.columns == spec.spark(spark, SF_CORRECT).columns


def test_queries_survive_ansi_mode(spark):
    """The driver's session may run with spark.sql.ansi.enabled=true
    (the Spark 4 default). Every query must not depend on permissive
    non-ANSI behavior (lenient casts, silent div-by-zero, unchecked
    element_at). Run the ANSI-sensitive subset under the flag."""
    risky = [
        "map_normalize",      # element_at on missing map key
        "separate_cols",      # array index bounds
        "string_funcs",       # split + getItem
        "rank_pctile_rescale",  # division
        "odds_math",          # casts + division + floor
        "vig_removal",        # pow/log chain
        "dedup_minhash_lsh",  # bigint hash arithmetic near overflow
        "calibration_logloss",
    ]
    old = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", "true")
    try:
        for name in risky:
            SPECS_BY_NAME[name].spark(spark, SF_SMOKE).write.format(
                "noop"
            ).mode("overwrite").save()
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)


SPECS_BY_NAME = {s.name: s for s in SPECS}


def test_fixture_tables_match_declared_schemas(spark):
    """schemas.py is the contract: catch silent testdata drift
    (inferSchema fragility is the reference's disease — SURVEY §1.3)."""
    import os

    from nfl_data_pipeline_spark import schemas as S
    from nfl_data_pipeline_spark.catalog import FIXTURE_TABLES, load, table_path

    for name in FIXTURE_TABLES:
        if not os.path.exists(table_path(SF_CORRECT, name)):
            continue
        df = load(spark, SF_CORRECT, name)
        if name == "events":
            # ts is read as bigint nanos (see catalog.load docstring)
            assert dict((f.name, f.dataType.simpleString()) for f in df.schema)[
                "ts"
            ] == "bigint"
            continue
        S.assert_schema(df, S.FIXTURE_SCHEMAS[name], name)
