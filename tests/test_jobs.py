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
    report = freshness_report(spark, path, "event_id").collect()
    top = [r["event_id"] for r in report]
    mx = ev.agg({"event_id": "max"}).collect()[0][0]
    assert top == list(range(mx, mx - 5, -1))
    # the reference stamps the report with lubridate::today()
    # (2_scrape_new_games.R:22-24); ours carries current_date()
    import datetime

    assert all(isinstance(r["as_of"], datetime.date) for r in report)


def test_upsert_by_key(spark, scratch):
    from pyspark.sql import functions as F

    from nfl_data_pipeline_spark.jobs.upsert import upsert_by_key

    orders = load(spark, SF_SMOKE, "orders").withColumn(
        "order_year", F.year("o_orderdate")
    )
    path = f"{scratch}/orders_upsert"
    orders.write.partitionBy("order_year").parquet(path)
    n_total = orders.count()

    # restate 50 rows of one year (prices doubled) + insert 3 new rows
    restated = (
        orders.filter("order_year = 1997")
        .orderBy("o_orderkey")
        .limit(50)
        .withColumn("o_totalprice", F.col("o_totalprice") * 2)
    )
    new_rows = (
        orders.filter("order_year = 1997")
        .orderBy(F.col("o_orderkey").desc())
        .limit(3)
        .withColumn("o_orderkey", F.col("o_orderkey") + 10_000_000)
    )
    incoming = restated.unionByName(new_rows)
    stats = upsert_by_key(spark, incoming, path, "o_orderkey", "order_year")
    assert stats == {"touched_partitions": 1, "upserted_rows": 53}

    after = spark.read.parquet(path)
    assert after.count() == n_total + 3
    # no duplicate keys
    assert after.select("o_orderkey").distinct().count() == n_total + 3
    # restated rows replaced, not appended
    key0 = restated.select("o_orderkey").first()[0]
    old_price = orders.filter(F.col("o_orderkey") == key0).first()["o_totalprice"]
    got = after.filter(F.col("o_orderkey") == key0).collect()
    assert len(got) == 1 and got[0]["o_totalprice"] == 2 * old_price
    # untouched partitions intact
    assert (
        after.filter("order_year != 1997").count()
        == orders.filter("order_year != 1997").count()
    )

    # idempotent: running the same upsert again changes nothing
    stats2 = upsert_by_key(spark, incoming, path, "o_orderkey", "order_year")
    assert stats2["upserted_rows"] == 53
    again = spark.read.parquet(path)
    assert again.count() == n_total + 3
    assert again.select("o_orderkey").distinct().count() == n_total + 3


def test_rollup_incremental_equals_full_rebuild(spark, scratch):
    """Continuous-aggregate maintenance: bootstrap on half the events,
    refresh with the other half → state identical to a full rebuild
    over everything; untouched buckets are not rewritten."""
    from pyspark.sql import functions as F

    from nfl_data_pipeline_spark.jobs.rollup import (
        build_rollup,
        read_rollup,
        refresh_rollup,
    )

    ev = load(spark, SF_SMOKE, "events")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)

    inc_path = f"{scratch}/rollup_inc"
    build_rollup(half1, inc_path)
    stats = refresh_rollup(spark, half2, inc_path)
    assert stats["touched_buckets"] > 0

    full_path = f"{scratch}/rollup_full"
    build_rollup(ev, full_path)

    got = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["sum_value"], r["avg_value"])
        for r in read_rollup(spark, inc_path).collect()
    }
    want = {
        (r["bucket_ns"], r["event_type"]): (r["n"], r["sum_value"], r["avg_value"])
        for r in read_rollup(spark, full_path).collect()
    }
    assert got == want

    # empty delta touches nothing
    assert refresh_rollup(spark, ev.filter(F.lit(False)), inc_path) == {
        "touched_buckets": 0,
        "replayed": False,
    }


def test_rollup_replay_is_noop(spark, scratch):
    """Replaying a batch id must not double-count merged state."""
    from pyspark.sql import functions as F

    from nfl_data_pipeline_spark.jobs.rollup import (
        build_rollup,
        read_rollup,
        refresh_rollup,
    )

    ev = load(spark, SF_SMOKE, "events")
    half1 = ev.filter(F.col("event_id") % 2 == 0)
    half2 = ev.filter(F.col("event_id") % 2 == 1)
    path = f"{scratch}/rollup_replay"
    build_rollup(half1, path)

    first = refresh_rollup(spark, half2, path, batch_id="batch-001")
    assert first["touched_buckets"] > 0 and not first["replayed"]
    before = sorted(
        (r["bucket_ns"], r["event_type"], r["n"])
        for r in read_rollup(spark, path).collect()
    )
    # replay the same delta with the same batch id → detected no-op
    again = refresh_rollup(spark, half2, path, batch_id="batch-001")
    assert again == {"touched_buckets": 0, "replayed": True}
    after = sorted(
        (r["bucket_ns"], r["event_type"], r["n"])
        for r in read_rollup(spark, path).collect()
    )
    assert after == before
