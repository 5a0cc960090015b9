"""Python DataSource over tx tables (sources/txsource.py): catalyst
filter pushdown reaching manifest file skipping, partition pruning,
snapshot/time-travel options, schema-evolution projection, and
result correctness under every pruning path."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.sources.txsource import TxTableDataSource


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    spark.dataSource.register(TxTableDataSource)
    root = str(tmp_path_factory.mktemp("txsrc") / "t")
    t = TxTable(root)
    df = spark.range(20_000).select(
        F.col("id").alias("k"),
        (F.col("id") % 4).alias("p"),
        F.md5(F.col("id").cast("string")).alias("v"),
    )
    # hash arrival order + k-clustering → selective per-file k stats
    t.commit(
        t.stage_files(
            df.orderBy("v"), "p", stats_cols=["k"],
            cluster_by=["k"], cluster_files=4,
        ),
        batch_id="load",
    )
    return root, t


def _read(spark, root, **opts):
    r = spark.read.format("txtable").option("path", root)
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_full_scan_matches_handle_read(spark, table):
    root, t = table
    src = _read(spark, root)
    assert src.count() == 20_000
    assert src.rdd.getNumPartitions() == len(t.live_files())
    a = {r["k"] for r in src.select("k").collect()}
    b = {r["k"] for r in t.read(spark).select("k").collect()}
    assert a == b


def test_range_filter_prunes_files_and_stays_correct(spark, table):
    root, t = table
    total = len(t.live_files())
    f = _read(spark, root).filter((F.col("k") >= 100) & (F.col("k") <= 199))
    assert f.rdd.getNumPartitions() < total, "stats pushdown pruned nothing"
    assert sorted(r["k"] for r in f.collect()) == list(range(100, 200))


def test_partition_filter_prunes(spark, table):
    root, t = table
    total = len(t.live_files())
    f = _read(spark, root, partitionColumn="p").filter(F.col("p") == 2)
    assert f.rdd.getNumPartitions() < total
    assert f.count() == 5_000
    assert f.select(F.min("k")).first()[0] == 2  # rows really are p=2
    fin = _read(spark, root, partitionColumn="p").filter(
        F.col("p").isin(1, 3)
    )
    assert fin.count() == 10_000


def test_residual_filter_remains_with_spark(spark, table):
    """Superset contract: the row-level predicate must appear ABOVE
    the scan even when pushed (a file can hold matching and
    non-matching rows)."""
    root, _ = table
    f = _read(spark, root).filter(F.col("k") < 50)
    plan = f._jdf.queryExecution().executedPlan().toString()
    assert "BatchScan txtable" in plan
    assert "Filter" in plan and "k#" in plan


def test_time_travel_and_schema_evolution(spark, table):
    root, t = table
    v0 = t.latest_version()
    t.commit(
        t.stage_files(
            spark.range(50_000, 50_010).select(
                F.col("id").alias("k"),
                F.lit(9).alias("p").cast("long"),
                F.lit("x").alias("v"),
                F.lit("new").alias("tag"),
            ),
            "p",
        ),
        batch_id="evolve",
    )
    cur = _read(spark, root)
    assert set(cur.columns) == {"k", "p", "v", "tag"}
    assert cur.count() == 20_010
    # pre-evolution rows read the added column as null
    assert cur.filter(F.col("tag").isNull()).count() == 20_000
    # time travel pins the old snapshot and its schema
    old = _read(spark, root, version=v0)
    assert set(old.columns) == {"k", "p", "v"}
    assert old.count() == 20_000


def test_stream_reader_is_exactly_once_cdc(spark, tmp_path):
    """readStream over a tx table: manifest versions are the offsets.
    Draining with availableNow delivers each committed row exactly
    once across separate runs sharing a checkpoint — the streaming
    twin of the CDC poll loop."""
    spark.dataSource.register(TxTableDataSource)
    root = str(tmp_path / "t")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    t = TxTable(root)

    def commit_range(a, b):
        t.commit(
            t.stage_files(
                spark.range(a, b).select(
                    F.col("id").alias("k"),
                    F.md5(F.col("id").cast("string")).alias("v"),
                )
            ),
            batch_id=f"r{a}",
        )

    def drain():
        q = (
            spark.readStream.format("txtable")
            .option("path", root)
            .load()
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    commit_range(0, 100)
    commit_range(100, 250)
    drain()
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == list(range(250))

    commit_range(250, 300)
    drain()  # same checkpoint → only the new version's rows arrive
    got = sorted(r["k"] for r in spark.read.parquet(out).collect())
    assert got == list(range(300)), "duplicate or lost CDC rows"


def test_batch_writer_appends_atomically_and_idempotently(spark, tmp_path):
    spark.dataSource.register(TxTableDataSource)
    root = str(tmp_path / "t")
    df = spark.range(1000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("p")
    )
    (
        df.write.format("txtable")
        .option("path", root)
        .option("partitionColumn", "p")
        .option("statsColumns", "k")
        .option("batchId", "load-1")
        .mode("append")
        .save()
    )
    t = TxTable(root)
    assert t.read(spark).count() == 1000
    assert t.is_applied("load-1")
    # every staged file carries exactly one partition value + k stats
    for f in t.live_files():
        assert f["partition"] in {"0", "1", "2"}
        assert "k" in f.get("stats", {})
    # replaying the same logical batch is a no-op
    (
        df.write.format("txtable")
        .option("path", root)
        .option("partitionColumn", "p")
        .option("batchId", "load-1")
        .mode("append")
        .save()
    )
    assert t.read(spark).count() == 1000
    assert t.latest_version() == 0
    # overwrite mode is refused loudly
    with pytest.raises(Exception, match="append-only"):
        df.write.format("txtable").option("path", root).mode(
            "overwrite"
        ).save()


def test_stream_writer_exactly_once_sink(spark, tmp_path):
    """writeStream into a tx table: the engine's epoch id lands in
    the manifest with the data, so the sink is exactly-once without
    foreachBatch plumbing."""
    spark.dataSource.register(TxTableDataSource)
    src = str(tmp_path / "src")
    root = str(tmp_path / "t")
    ckpt = str(tmp_path / "ckpt")
    spark.range(500).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("v")
    ).coalesce(2).write.parquet(src)

    def drain():
        q = (
            spark.readStream.schema("k long, v string")
            .parquet(src)
            .writeStream.format("txtable")
            .option("path", root)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    drain()
    t = TxTable(root)
    assert sorted(r["k"] for r in t.read(spark).collect()) == list(range(500))
    assert any(b.startswith("epoch-") for b in t.manifest()["batch_ids"])
    v_after = t.latest_version()

    drain()  # no new input → no new commits, no duplicates
    assert t.latest_version() == v_after
    assert t.read(spark).count() == 500


def test_two_stream_writers_with_sink_ids_share_a_table(spark, tmp_path):
    """Two streaming queries appending into ONE tx table: distinct
    sinkIds namespace their epoch markers, so both pipelines keep
    exactly-once semantics instead of reading each other's epoch-0
    marker as their own replay (the failure the namespacing fixed)."""
    spark.dataSource.register(TxTableDataSource)
    root = str(tmp_path / "t")
    for name, lo in (("alpha", 0), ("beta", 1000)):
        src = str(tmp_path / f"src_{name}")
        spark.range(lo, lo + 300).select(
            F.col("id").alias("k"), F.lit(name).alias("src")
        ).coalesce(1).write.parquet(src)
        q = (
            spark.readStream.schema("k long, src string")
            .parquet(src)
            .writeStream.format("txtable")
            .option("path", root)
            .option("sinkId", name)
            .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    t = TxTable(root)
    assert t.read(spark).count() == 600
    bids = set(t.manifest()["batch_ids"])
    assert any(b.startswith("epoch-alpha-") for b in bids)
    assert any(b.startswith("epoch-beta-") for b in bids)
    # both queries wrote their epoch 0 — without namespacing the
    # second would have been swallowed as a replay
    assert {"epoch-alpha-0", "epoch-beta-0"} <= bids


def test_nested_attribute_filters_are_not_folded(spark, table):
    """ADVICE r3: a pushed filter on nested field s.k must not be
    treated as a filter on top-level 'k' (a stats-bearing column) —
    file pruning by the wrong column would silently DROP rows,
    breaking the superset guarantee."""
    from pyspark.sql.datasource import EqualTo, GreaterThan

    from nfl_data_pipeline_spark.sources.txsource import TxTableReader

    r = TxTableReader({"path": "/nowhere", "partitionColumn": "p"}, None)
    fs = [
        EqualTo(attribute=("s", "k"), value=150),
        GreaterThan(attribute=("s", "p"), value=1),
    ]
    residual = list(r.pushFilters(fs))
    assert residual == fs  # everything yielded back for row eval
    assert r.ranges == {} and r.partitions_in is None  # nothing folded
    # a genuine top-level filter still folds
    assert list(r.pushFilters([EqualTo(attribute=("k",), value=5)]))
    assert r.ranges == {"k": (5, 5)}


def test_writer_escapes_hostile_partition_values(spark, tmp_path):
    """ADVICE r3: partition values containing '/' must not escape the
    staging dir via the filename; nulls are rejected like
    TxTable.stage_files."""
    spark.dataSource.register(TxTableDataSource)
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [(1, "a/b"), (2, "a/b"), (3, "plain")], "k long, p string"
    )
    (
        df.write.format("txtable")
        .option("path", root)
        .option("partitionColumn", "p")
        .option("batchId", "hostile")
        .mode("append")
        .save()
    )
    t = TxTable(root)
    assert {f["partition"] for f in t.live_files()} == {"a/b", "plain"}
    got = _read(spark, root, partitionColumn="p").filter(
        F.col("p") == "a/b"
    )
    assert sorted(r["k"] for r in got.collect()) == [1, 2]

    with pytest.raises(Exception, match="null partition"):
        spark.createDataFrame(
            [(1, None)], "k long, p string"
        ).write.format("txtable").option("path", str(tmp_path / "t2")).option(
            "partitionColumn", "p"
        ).mode("append").save()


def test_bucketed_tx_join_no_shuffle(spark, tmp_path):
    """VERDICT r3 #9: two tables co-bucketed on the join key join
    partition-wise — per-bucket scans + manifest-byte-chosen broadcast
    sides, ZERO hashpartitioning exchanges — and the result equals the
    plain shuffled join."""
    from nfl_data_pipeline_spark.sources.txsource import bucketed_tx_join

    ta = TxTable(str(tmp_path / "a"))
    tb = TxTable(str(tmp_path / "b"))
    a = spark.range(8_000).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(8)).alias("bucket"),
        F.md5(F.col("id").cast("string")).alias("va"),
    )
    b = spark.range(0, 12_000, 3).select(
        F.col("id").alias("k"),
        F.pmod(F.xxhash64("id"), F.lit(8)).alias("bucket"),
        (F.col("id") * 2).alias("vb"),
    )
    ta.commit(ta.stage_files(a, "bucket"), batch_id="a")
    tb.commit(tb.stage_files(b, "bucket"), batch_id="b")

    j = bucketed_tx_join(spark, ta, tb, ["k"], project_b=["k", "vb"])
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, "bucketed join shuffled"
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoop" not in plan

    got = {(r["k"], r["vb"]) for r in j.select("k", "vb").collect()}
    want = {
        (r["k"], r["vb"])
        for r in ta.read(spark).join(tb.read(spark).select("k", "vb"), "k")
        .select("k", "vb").collect()
    }
    assert got == want and len(got) == len(range(0, 8_000, 3))

    # semi/anti variants stay bucket-local and complete
    semi = bucketed_tx_join(
        spark, ta, tb, ["k"], how="left_semi", project_b=["k"]
    )
    assert semi.count() == len(got)
    anti = bucketed_tx_join(
        spark, ta, tb, ["k"], how="left_anti", project_b=["k"]
    )
    assert anti.count() == 8_000 - len(got)
    with pytest.raises(ValueError, match="not complete"):
        bucketed_tx_join(spark, ta, tb, ["k"], how="full_outer")

    # left OUTER is bucket-complete too (r8): unmatched A rows keep
    # null-extended B columns; result equals the shuffled left join
    left = bucketed_tx_join(
        spark, ta, tb, ["k"], how="left", project_b=["k", "vb"]
    )
    lplan = left._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in lplan
    lgot = {(r["k"], r["vb"]) for r in left.select("k", "vb").collect()}
    lwant = {
        (r["k"], r["vb"])
        for r in ta.read(spark)
        .join(tb.read(spark).select("k", "vb"), "k", "left")
        .select("k", "vb")
        .collect()
    }
    assert lgot == lwant and len(lgot) == 8_000


def test_bucketed_tx_join_left_null_extends_missing_bucket(spark, tmp_path):
    """An A bucket with NO B counterpart: the left-outer form emits
    A's rows with typed null B columns (what the per-bucket left join
    against an empty slice would produce)."""
    from nfl_data_pipeline_spark.sources.txsource import bucketed_tx_join

    ta = TxTable(str(tmp_path / "a"))
    tb = TxTable(str(tmp_path / "b"))
    a = spark.createDataFrame(
        [(1, 0, "x"), (2, 1, "y")], "k long, bucket int, va string"
    )
    b = spark.createDataFrame([(1, 0, 10)], "k long, bucket int, vb long")
    ta.commit(ta.stage_files(a, "bucket"), batch_id="a")
    tb.commit(tb.stage_files(b, "bucket"), batch_id="b")  # bucket 1 absent
    left = bucketed_tx_join(
        spark, ta, tb, ["k"], how="left", project_b=["k", "vb"]
    )
    got = {(r["k"], r["vb"]) for r in left.select("k", "vb").collect()}
    assert got == {(1, 10), (2, None)}
    assert dict(left.dtypes)["vb"] == "bigint"  # typed, not string-null

    # ENTIRELY-empty B with a schema anchor: A survives null-extended
    # (consistent with left_anti), not a silent None
    tb2 = TxTable(str(tmp_path / "b2"))
    tb2.commit(tb2.stage_files(b.limit(0), "bucket"), batch_id="empty")
    if tb2.manifest().get("schema_file"):
        left2 = bucketed_tx_join(
            spark, ta, tb2, ["k"], how="left", project_b=["k", "vb"]
        )
        got2 = {(r["k"], r["vb"]) for r in left2.select("k", "vb").collect()}
        assert got2 == {(1, None), (2, None)}


def test_range_copartitioned_forget_layout_join(spark, tmp_path):
    """VERDICT r7 #7: the forget range-cluster layout
    (jobs/forget._range_part_expr) makes range-co-partitioned tables
    common — two tables sharing (id_col, lo, width) join partition-
    wise with no exchange, and the layout_meta guard refuses a
    differently-laid-out pair instead of silently dropping matches."""
    from nfl_data_pipeline_spark.jobs.forget import _range_part_expr
    from nfl_data_pipeline_spark.sources.txsource import bucketed_tx_join

    lo, width = -1000, 500
    ta = TxTable(str(tmp_path / "a"))
    tb = TxTable(str(tmp_path / "b"))
    layout = {"col": "part", "id_col": "k", "lo": lo, "width": width}
    a = spark.range(-900, 900, 1).select(
        F.col("id").alias("k"), F.md5(F.col("id").cast("string")).alias("va")
    ).withColumn("part", _range_part_expr("k", lo, width))
    b = spark.range(-900, 900, 7).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("vb")
    ).withColumn("part", _range_part_expr("k", lo, width))
    ta.commit(ta.stage_files(a, "part"), batch_id="a", meta={"layout": layout})
    tb.commit(tb.stage_files(b, "part"), batch_id="b", meta={"layout": layout})

    j = bucketed_tx_join(
        spark, ta, tb, ["k"], project_b=["k", "vb"], layout_meta="layout"
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan
    got = {(r["k"], r["vb"]) for r in j.collect()}
    want = {(k, k * 3) for k in range(-900, 900, 7)}
    assert got == want

    # a third table under DIFFERENT range arithmetic must be refused
    tc = TxTable(str(tmp_path / "c"))
    other = {"col": "part", "id_col": "k", "lo": 0, "width": 250}
    c = b.withColumn("part", _range_part_expr("k", 0, 250))
    tc.commit(tc.stage_files(c, "part"), batch_id="c", meta={"layout": other})
    with pytest.raises(ValueError, match="layout mismatch"):
        bucketed_tx_join(
            spark, ta, tc, ["k"], project_b=["k", "vb"], layout_meta="layout"
        )
    # an UNSTAMPED pair must not pass the guard as None == None
    td = TxTable(str(tmp_path / "d"))
    td.commit(td.stage_files(b, "part"), batch_id="d")  # no layout meta
    with pytest.raises(ValueError, match="layout meta"):
        bucketed_tx_join(
            spark, ta, td, ["k"], project_b=["k", "vb"], layout_meta="layout"
        )
