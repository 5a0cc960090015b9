"""Structured Streaming tests: file-source stream, watermarked window
aggregation, exactly-once foreachBatch merge on replay."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.streaming.ingest import (
    dedup_within_watermark,
    merge_append_stream,
    stream_events,
    windowed_counts,
)
from tests.conftest import SF_SMOKE

SCRATCH = "/root/repo/.scratch"


@pytest.fixture()
def scratch():
    import tempfile

    os.makedirs(SCRATCH, exist_ok=True)
    d = tempfile.mkdtemp(dir=SCRATCH)
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _stage_event_files(spark, scratch: str, n_files: int = 3) -> str:
    """Split the events fixture into several parquet files to simulate
    arrival batches."""
    src = f"{scratch}/incoming"
    ev = load(spark, SF_SMOKE, "events")
    ev.withColumn("part", F.col("event_id") % n_files).repartition(
        n_files, "part"
    ).drop("part").write.mode("overwrite").parquet(src)
    # drop spark's _SUCCESS marker noise; keep data files
    return src


def test_stream_windowed_counts_match_batch(spark, scratch):
    src = _stage_event_files(spark, scratch)
    out = f"{scratch}/win_out"
    q = (
        windowed_counts(stream_events(spark, src), window="1 hour")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{scratch}/ckpt_win")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = spark.read.parquet(out)
    # batch recomputation of the same aggregation
    ev = load(spark, SF_SMOKE, "events").withColumn(
        "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    want = (
        ev.groupBy(F.window("event_time", "1 hour").alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n",
        )
    )
    # append mode emits only windows the final watermark has CLOSED;
    # windows still open when the availableNow stream drains stay in
    # state and are never flushed.
    import datetime

    max_t = ev.agg(F.max("event_time")).collect()[0][0]
    cutoff = max_t - datetime.timedelta(minutes=30)
    want_closed = {
        (r["window_start"], r["event_type"], r["n"])
        for r in want.collect()
        if r["window_end"] <= cutoff
    }
    got_set = {
        (r["window_start"], r["event_type"], r["n"])
        for r in got.select("window_start", "event_type", "n").collect()
    }
    assert want_closed <= got_set, "a closed window is missing or wrong"
    # nothing in the stream output disagrees with batch
    want_all = {
        (r["window_start"], r["event_type"], r["n"]) for r in want.collect()
    }
    assert got_set <= want_all


def test_session_window_stream_matches_batch_on_rocksdb(spark, scratch):
    """session_window streaming twin of the batch sessionize query,
    run on the RocksDB state store (the 100TB-scale state backend)."""
    import datetime

    from nfl_data_pipeline_spark.streaming.ingest import (
        ROCKSDB_PROVIDER,
        session_windowed_counts,
        use_rocksdb_state,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    use_rocksdb_state(spark)
    try:
        assert (
            spark.conf.get("spark.sql.streaming.stateStore.providerClass")
            == ROCKSDB_PROVIDER
        )
        src = _stage_event_files(spark, scratch)
        out = f"{scratch}/sess_out"
        q = (
            session_windowed_counts(
                stream_events(spark, src), gap="30 minutes", watermark="30 minutes"
            )
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", f"{scratch}/ckpt_sess")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        got = spark.read.parquet(out)

        ev = load(spark, SF_SMOKE, "events").withColumn(
            "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
        )
        want = (
            ev.groupBy(
                F.session_window("event_time", "30 minutes").alias("win"), "user_id"
            )
            .agg(F.count("*").alias("n_events"))
            .select(
                F.col("win.start").alias("session_start"),
                F.col("win.end").alias("session_end"),
                "user_id",
                "n_events",
            )
        )
        # append mode only flushes sessions the final watermark closed
        max_t = ev.agg(F.max("event_time")).collect()[0][0]
        cutoff = max_t - datetime.timedelta(minutes=30)
        want_closed = {
            (r["session_start"], r["user_id"], r["n_events"])
            for r in want.collect()
            if r["session_end"] <= cutoff
        }
        got_set = {
            (r["session_start"], r["user_id"], r["n_events"])
            for r in got.select("session_start", "user_id", "n_events").collect()
        }
        assert want_closed <= got_set, "a closed session is missing or wrong"
        want_all = {
            (r["session_start"], r["user_id"], r["n_events"]) for r in want.collect()
        }
        assert got_set <= want_all
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", prev)


def test_merge_append_stream_exactly_once_on_replay(spark, scratch):
    src = _stage_event_files(spark, scratch)
    table = f"{scratch}/events_table"

    q = merge_append_stream(
        spark,
        stream_events(spark, src),
        table,
        checkpoint_dir=f"{scratch}/ckpt_m1",
        key="event_id",
    )
    q.awaitTermination(300)
    n_total = load(spark, SF_SMOKE, "events").count()
    assert spark.read.parquet(table).count() == n_total

    # replay the whole source with a FRESH checkpoint (worst case:
    # checkpoint lost, full re-delivery) — merge must add nothing
    q2 = merge_append_stream(
        spark,
        stream_events(spark, src),
        table,
        checkpoint_dir=f"{scratch}/ckpt_m2",
        key="event_id",
    )
    q2.awaitTermination(300)
    assert spark.read.parquet(table).count() == n_total
    assert (
        spark.read.parquet(table).select("event_id").distinct().count() == n_total
    )


def test_dedup_within_watermark_streaming(spark, scratch):
    src = _stage_event_files(spark, scratch)
    out = f"{scratch}/dedup_out"
    # duplicate the source files to force replayed events
    for f in os.listdir(src):
        if f.endswith(".parquet"):
            shutil.copy(f"{src}/{f}", f"{src}/dup_{f}")
    q = (
        dedup_within_watermark(stream_events(spark, src))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{scratch}/ckpt_d")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    n_total = load(spark, SF_SMOKE, "events").count()
    assert got.count() == n_total
    assert got.select("event_id").distinct().count() == n_total


def test_stateful_running_totals(spark, scratch):
    from nfl_data_pipeline_spark.streaming.stateful import running_user_totals

    src = _stage_event_files(spark, scratch)
    out = f"{scratch}/state_out"

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    # subset of users: state-store + python-worker startup dominates,
    # semantics are identical
    stream = stream_events(spark, src).filter(F.col("user_id") < 12)
    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{scratch}/ckpt_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    # final emitted state per user (last micro-batch's update) must
    # match the batch totals
    final = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in got.orderBy("n_events")
        .groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value").alias("sum_value"),
        )
        .collect()
    }
    ev = load(spark, SF_SMOKE, "events").filter(F.col("user_id") < 12)
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(want)
    for u, (n, s) in want.items():
        assert final[u][0] == n
        assert abs(final[u][1] - s) < 1e-6


def test_rate_events_shape_and_flow(spark, scratch):
    """Rate-limited synthetic source: events-shaped rows actually
    flow, with the declared schema. (availableNow drains nothing at
    t=0 on a rate source, so run on a processing-time trigger and
    poll.)"""
    import time

    from nfl_data_pipeline_spark.streaming.ingest import rate_events

    stream = rate_events(spark, rows_per_second=500, num_partitions=4)
    q = (
        stream.writeStream.format("memory")
        .queryName("rate_sink")
        .option("checkpointLocation", f"{scratch}/ckpt_rate")
        .outputMode("append")
        .trigger(processingTime="500 milliseconds")
        .start()
    )
    try:
        deadline = time.monotonic() + 60
        while (
            spark.table("rate_sink").limit(1).count() == 0
            and time.monotonic() < deadline
        ):
            time.sleep(0.5)
    finally:
        q.stop()
    got = spark.table("rate_sink")
    assert got.columns == [
        "event_id",
        "ts",
        "user_id",
        "event_type",
        "value",
        "props",
        "event_time",
    ]
    rows = got.collect()
    assert rows, "rate source produced no rows within the poll window"
    types = {r["event_type"] for r in rows}
    assert types <= {"click", "view", "purchase"}
    assert all(r["user_id"] < 1000 for r in rows)


def test_max_files_per_trigger_bounds_batches(spark, scratch):
    """File-source rate limiting: 3 staged files with
    maxFilesPerTrigger=1 must drain in ≥3 micro-batches, never one
    giant catch-up batch."""
    src = _stage_event_files(spark, scratch, n_files=3)
    q = (
        stream_events(spark, src, max_files_per_trigger=1)
        .writeStream.format("memory")
        .queryName("ratelimit_sink")
        .option("checkpointLocation", f"{scratch}/ckpt_mft")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    # availableNow + maxFilesPerTrigger=1 splits the 3-file backlog
    # into multiple batches (observed: not strictly one file each, but
    # never one giant catch-up batch)
    n_batches = len([p for p in q.recentProgress if p["numInputRows"] > 0])
    assert n_batches >= 2
    total = spark.table("ratelimit_sink").count()
    from nfl_data_pipeline_spark.catalog import load

    assert total == load(spark, SF_SMOKE, "events").count()


def test_stream_static_enrichment(spark, scratch):
    """Stream-static broadcast join: every streamed event picks up its
    dimension row; dimension misses keep NULL (left join)."""
    from nfl_data_pipeline_spark.streaming.ingest import enrich_with_dim

    src = _stage_event_files(spark, scratch)
    dim = spark.createDataFrame(
        [(t, f"team_{t}") for t in range(0, 500, 2)],  # only even users
        "user_id long, team string",
    )
    q = (
        enrich_with_dim(stream_events(spark, src), dim, "user_id")
        .writeStream.format("memory")
        .queryName("enriched_sink")
        .option("checkpointLocation", f"{scratch}/ckpt_enrich")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.table("enriched_sink")
    ev = load(spark, SF_SMOKE, "events")
    assert got.count() == ev.count()  # left join never drops events
    with_team = got.filter("team IS NOT NULL")
    assert with_team.count() > 0
    assert with_team.filter("user_id % 2 != 0").count() == 0


def test_stream_stream_join_matches_batch(spark, scratch):
    """Watermarked stream-stream click⋈purchase join drains to the
    same pair set a plain batch join over the same bound produces."""
    from pyspark.sql import functions as F

    from nfl_data_pipeline_spark.streaming.ingest import (
        click_purchase_join,
        stream_events,
    )

    src = _stage_event_files(spark, scratch)
    stream = stream_events(spark, src)
    clicks = stream.filter("event_type = 'click'")
    purchases = stream.filter("event_type = 'purchase'")
    q = (
        click_purchase_join(clicks, purchases, max_gap="1 hour")
        .writeStream.format("memory")
        .queryName("ss_join_sink")
        .option("checkpointLocation", f"{scratch}/ckpt_ssj")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = {
        (r["click_id"], r["purchase_id"])
        for r in spark.table("ss_join_sink").collect()
    }

    ev = load(spark, SF_SMOKE, "events").withColumn(
        "event_time", F.timestamp_micros((F.col("ts") / 1000).cast("long"))
    )
    c = ev.filter("event_type = 'click'").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("c_user"),
        F.col("event_time").alias("click_time"),
    )
    p = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("p_user"),
        F.col("event_time").alias("purchase_time"),
    )
    want = {
        (r["click_id"], r["purchase_id"])
        for r in c.join(
            p,
            (F.col("c_user") == F.col("p_user"))
            & (F.col("purchase_time") >= F.col("click_time"))
            & (
                F.col("purchase_time")
                <= F.col("click_time") + F.expr("INTERVAL 1 hour")
            ),
        ).collect()
    }
    # availableNow drains everything; watermark eviction may hold back
    # pairs whose windows were still open at end-of-stream, so the
    # streamed set is a subset that must cover the comfortably-closed
    # windows — with this fixture the drain emits them all
    assert got == want and len(got) > 0


def test_rollup_maintenance_stream_replay_exactly_once(spark, scratch):
    """Streaming continuous-aggregate maintenance composes the
    foreachBatch sink with the rollup's batch_id replay ledger: a full
    re-delivery of the source (fresh checkpoint, same batch ids) must
    leave the rollup state untouched, and the maintained state must
    equal a from-scratch batch rollup over all events."""
    from nfl_data_pipeline_spark.jobs.rollup import build_rollup, read_rollup
    from nfl_data_pipeline_spark.streaming.ingest import (
        rollup_maintenance_stream,
    )

    src = _stage_event_files(spark, scratch)
    rollup_path = f"{scratch}/rollup_stream"

    def run(ckpt):
        q = rollup_maintenance_stream(
            spark,
            # one batch per run → replayed run re-presents batch id 0
            stream_events(spark, src, max_files_per_trigger=100),
            rollup_path,
            checkpoint_dir=f"{scratch}/{ckpt}",
        )
        q.awaitTermination(300)

    run("ckpt_r1")

    def state():
        return sorted(
            (r["bucket_ns"], r["event_type"], r["n"], r["sum_value"])
            for r in read_rollup(spark, rollup_path).collect()
        )

    first = state()
    # worst case: checkpoint lost, the whole source re-delivers with
    # the same batch decomposition → ledger detects batch 0, no-op
    run("ckpt_r2")
    assert state() == first

    # maintained state == from-scratch batch rollup over everything
    full_path = f"{scratch}/rollup_batch_full"
    build_rollup(load(spark, SF_SMOKE, "events"), full_path)
    want = sorted(
        (r["bucket_ns"], r["event_type"], r["n"], r["sum_value"])
        for r in read_rollup(spark, full_path).collect()
    )
    assert first == want


def test_stream_pii_redaction_matches_batch(spark, scratch):
    """The PII scrubbing projection is stateless, so the SAME function
    used by the batch query applies verbatim to a documents file
    stream — per-record transformation on continuous ingest, result
    identical to the batch twin."""
    from nfl_data_pipeline_spark.queries.llmprep import (
        pii_enrich,
        pii_projection,
    )
    from nfl_data_pipeline_spark.schemas import FIXTURE_SCHEMAS

    src = f"{scratch}/docs_incoming"
    docs = load(spark, SF_SMOKE, "documents")
    docs.withColumn("part", F.col("doc_id") % 3).repartition(
        3, "part"
    ).drop("part").write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(FIXTURE_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = f"{scratch}/pii_out"
    q = (
        pii_projection(pii_enrich(stream))
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{scratch}/ckpt_pii")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        tuple(r) for r in spark.read.parquet(out).collect()
    }
    want = {tuple(r) for r in pii_projection(pii_enrich(docs)).collect()}
    assert got == want and len(want) > 0


def test_stream_packing_matches_batch(spark, scratch):
    """Stateful streaming packer vs the batch window packer: with
    in-order arrival (one file per doc_id range, oldest first), the
    per-document bin assignment must be identical — the running token
    sum carried in GroupState is the stream twin of the batch
    running-sum window."""
    import time as _time

    from nfl_data_pipeline_spark.queries.llmprep import _PACK_BUDGET
    from nfl_data_pipeline_spark.schemas import FIXTURE_SCHEMAS
    from nfl_data_pipeline_spark.streaming.packing import pack_stream

    src = f"{scratch}/docs_ordered"
    os.makedirs(src, exist_ok=True)
    docs = load(spark, SF_SMOKE, "documents")
    n_docs = docs.count()
    # three arrival files split by doc_id range, written oldest-first
    # into ONE source dir (the file source orders by modification
    # time; the streaming parquet source takes a single directory)
    import pyarrow as pa
    import pyarrow.parquet as pq

    cuts = [0, n_docs // 3, 2 * n_docs // 3, n_docs]
    pdf_all = docs.toPandas().sort_values("doc_id")
    for i in range(3):
        part = pdf_all[
            (pdf_all["doc_id"] >= cuts[i]) & (pdf_all["doc_id"] < cuts[i + 1])
        ]
        pq.write_table(
            pa.Table.from_pandas(part, preserve_index=False),
            f"{src}/f{i}.parquet",
        )
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(FIXTURE_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = f"{scratch}/pack_out"
    q = (
        pack_stream(stream, budget=_PACK_BUDGET)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{scratch}/ckpt_pack")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {
        (r["source"], r["doc_id"]): (r["n_tokens"], r["bin_id"])
        for r in spark.read.parquet(out).collect()
    }

    from pyspark.sql.window import Window

    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    batch = (
        docs.select(
            "source",
            "doc_id",
            F.size(F.split(F.col("text"), " ")).alias("n_tokens"),
        )
        .withColumn("cum", F.sum("n_tokens").over(w))
        .withColumn(
            "bin_id",
            F.floor((F.col("cum") - F.col("n_tokens")) / F.lit(_PACK_BUDGET)),
        )
    )
    want = {
        (r["source"], r["doc_id"]): (r["n_tokens"], r["bin_id"])
        for r in batch.collect()
    }
    assert len(got) == n_docs
    assert got == want


def test_merge_append_recovers_from_mid_stream_crash(spark, scratch):
    """Kill-and-restart exactly-once (the last corner of the
    2_scrape_new_games.R contract): the query CRASHES inside
    foreachBatch after batch 0 committed, while batch 1 is in flight.
    Restarting from the SAME checkpoint replays batch 1; the anti-join
    merge must keep the final table exactly-once, and the recovery run
    must not re-deliver batch 0's files."""
    from nfl_data_pipeline_spark.jobs.update import incremental_append

    # stage three guaranteed-NON-EMPTY files (hash repartition can
    # leave a part empty, which would make batch 0 a no-op)
    src = f"{scratch}/incoming_crash"
    ev = load(spark, SF_SMOKE, "events")
    for i in range(3):
        ev.filter(F.col("event_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(src)
    table = f"{scratch}/events_table_crash"
    ckpt = f"{scratch}/ckpt_crash"  # ONE checkpoint across both runs
    crash_marker = f"{scratch}/crashed_once"
    seen_batches: list[int] = []

    def _merge_with_crash(batch_df, batch_id: int) -> None:
        seen_batches.append(batch_id)
        if batch_id == 1 and not os.path.exists(crash_marker):
            # crash mid-batch BEFORE the merge commits anything
            open(crash_marker, "w").close()
            raise RuntimeError("simulated executor loss mid-batch")
        incremental_append(spark, batch_df, table, "event_id")

    def _run():
        return (
            stream_events(spark, src, max_files_per_trigger=1)
            .writeStream.foreachBatch(_merge_with_crash)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )

    q = _run()
    with pytest.raises(Exception):  # StreamingQueryException on batch 1
        q.awaitTermination(300)
    n_after_crash = spark.read.parquet(table).count()
    n_total = load(spark, SF_SMOKE, "events").count()
    assert 0 < n_after_crash < n_total  # batch 0 landed, stream died

    q2 = _run()  # SAME checkpoint: recovery, not re-delivery
    q2.awaitTermination(300)
    final = spark.read.parquet(table)
    assert final.count() == n_total
    assert final.select("event_id").distinct().count() == n_total
    # batch 1 was replayed with ITS OWN id (checkpoint semantics), and
    # batch 0 never re-entered foreachBatch on the recovery run
    assert seen_batches.count(1) == 2
    assert seen_batches.count(0) == 1


def test_stateful_running_totals_transformwithstate(spark, scratch):
    """The StatefulProcessor (transformWithStateInPandas) twin of
    running_user_totals emits the same final per-user totals — both
    API surfaces, one semantics.

    Environment gate: the transformWithState state protocol speaks
    protobuf between the JVM and the Python driver worker; this
    container ships no google.protobuf (same class of constraint as
    the compressed multimodal codecs), so the test skips where the
    dependency is absent and runs wherever Spark's own requirements
    are met."""
    pytest.importorskip(
        "google.protobuf",
        reason="transformWithState requires protobuf (absent in sandbox)",
    )
    from nfl_data_pipeline_spark.streaming.ingest import use_rocksdb_state
    from nfl_data_pipeline_spark.streaming.stateful import (
        running_user_totals_tws,
    )

    prev = spark.conf.get(
        "spark.sql.streaming.stateStore.providerClass", None
    )
    use_rocksdb_state(spark)  # transformWithState requires RocksDB
    src = _stage_event_files(spark, scratch)
    out = f"{scratch}/tws_out"

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out)

    stream = stream_events(spark, src).filter(F.col("user_id") < 12)
    q = (
        running_user_totals_tws(stream)
        .writeStream.foreachBatch(sink)
        .option("checkpointLocation", f"{scratch}/ckpt_tws")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    try:
        q.awaitTermination(300)
    finally:
        if prev is None:
            spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        else:
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", prev
            )
    got = spark.read.parquet(out)
    final = {
        r["user_id"]: (r["n_events"], r["sum_value"])
        for r in got.groupBy("user_id")
        .agg(
            F.max("n_events").alias("n_events"),
            F.max("sum_value").alias("sum_value"),
        )
        .collect()
    }
    ev = load(spark, SF_SMOKE, "events").filter(F.col("user_id") < 12)
    want = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(F.count("*").alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(final) == set(want)
    for u, (n, s) in want.items():
        assert final[u][0] == n
        assert abs(final[u][1] - s) < 1e-6


def test_stream_chunking_matches_batch(spark, scratch):
    """chunk_documents is a narrow projection + explode — stateless,
    so the SAME operator applies verbatim to a documents file stream
    and yields exactly the batch twin's chunks."""
    from nfl_data_pipeline_spark.operators.text import chunk_documents
    from nfl_data_pipeline_spark.schemas import FIXTURE_SCHEMAS

    src = f"{scratch}/docs_chunk_in"
    docs = load(spark, SF_SMOKE, "documents").select("doc_id", "text")
    docs.write.mode("overwrite").parquet(src)

    stream = (
        spark.readStream.schema(FIXTURE_SCHEMAS["documents"])
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .select("doc_id", "text")
    )
    out = f"{scratch}/chunk_out"
    q = (
        chunk_documents(stream, window=32, stride=24)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", f"{scratch}/ckpt_chunk")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)

    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    want = {
        tuple(r)
        for r in chunk_documents(docs, window=32, stride=24).collect()
    }
    assert got == want and len(want) > 0
