"""Lifecycle-job tests: rebuild, idempotent incremental append
(SURVEY.md §3.1-3.2; property 'running the merge twice adds nothing'
mirrors update_db's contract)."""

from __future__ import annotations

import os
import shutil

import pytest

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.jobs.rebuild import rebuild, sanity_counts
from nfl_data_pipeline_spark.jobs.update import freshness_report, incremental_append
from tests.conftest import SF_SMOKE

SCRATCH = "/root/repo/.scratch"


@pytest.fixture()
def scratch():
    import tempfile

    os.makedirs(SCRATCH, exist_ok=True)
    d = tempfile.mkdtemp(dir=SCRATCH)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_rebuild_and_sanity(spark, scratch):
    orders = load(spark, SF_SMOKE, "orders")
    out = f"{scratch}/orders_tbl"
    rebuild(orders, out, partition_col="o_orderstatus")
    counts = sanity_counts(spark, out, "o_orderstatus")
    got = {r["o_orderstatus"]: r["count"] for r in counts.collect()}
    assert sum(got.values()) == orders.count()
    # partition layout exists (one dir per status value)
    import os

    assert any(p.startswith("o_orderstatus=") for p in os.listdir(out))


def test_incremental_append_idempotent(spark, scratch):
    ev = load(spark, SF_SMOKE, "events")
    first = ev.filter("event_id < 600")
    late = ev.filter("event_id >= 400")  # overlaps 400-599
    path = f"{scratch}/events_tbl"

    assert incremental_append(spark, first, path, "event_id") == 600
    n2 = incremental_append(spark, late, path, "event_id")
    assert n2 == ev.count() - 600  # only the genuinely new rows
    # replay: nothing to add
    assert incremental_append(spark, late, path, "event_id") == 0
    assert spark.read.parquet(path).count() == ev.count()
    # no duplicate keys
    assert (
        spark.read.parquet(path).select("event_id").distinct().count()
        == ev.count()
    )


def test_freshness_report(spark, scratch):
    ev = load(spark, SF_SMOKE, "events")
    path = f"{scratch}/events_fresh"
    incremental_append(spark, ev, path, "event_id")
    top = [r["event_id"] for r in freshness_report(spark, path, "event_id").collect()]
    mx = ev.agg({"event_id": "max"}).collect()[0][0]
    assert top == list(range(mx, mx - 5, -1))
