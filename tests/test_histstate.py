"""Mergeable length-histogram state (operators/sketches.py +
streaming/stats.py): bucket determinism at boundaries, quantile
recovery error bounds vs exact percentiles, incremental merge ==
one-shot, and replay idempotence."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.jobs.txlog import TxTable
from nfl_data_pipeline_spark.operators.sketches import (
    duck_len_bucket,
    histogram_counts,
    histogram_quantiles,
    sp_len_bucket,
)
from nfl_data_pipeline_spark.streaming.stats import (
    read_quantile_state,
    update_histogram_state,
)
from tests.conftest import SF_SMOKE


def test_bucket_ids_bit_identical_across_engines(spark):
    """Power-of-ten boundaries are where a log10 bucketing would
    drift between engines; the integer bucketing must not."""
    vals = (
        list(range(0, 130))
        + [999, 1000, 1001, 9999, 10000, 10001, 99999, 100000]
        + [10**9 - 1, 10**9, 10**12]
    )
    sdf = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r["x"]: r["b"]
        for r in sdf.select("x", F.expr(sp_len_bucket("x")).alias("b")).collect()
    }
    con = duckdb.connect()
    for v in vals:
        (db,) = con.execute(
            f"SELECT {duck_len_bucket(str(v))}"
        ).fetchone()
        assert got[v] == db, f"bucket mismatch at {v}: spark {got[v]} duck {db}"
    # singletons below 10 are exact and ordered
    assert [got[v] for v in range(10)] == list(range(-10, 0))
    # bucket ids are monotone in x
    ordered = [got[v] for v in sorted(vals)]
    assert ordered == sorted(ordered)


def test_quantile_recovery_within_bucket_width(spark):
    """Recovered quantiles vs exact percentile_approx(acc=1e6): within
    the ~5% bucket relative width (exact below 10)."""
    docs = load(spark, SF_SMOKE, "documents").select(
        "source", F.size(F.split("text", " ")).cast("long").alias("nt")
    )
    hist = histogram_counts(docs, ["source"], "nt")
    got = {
        r["source"]: (r["p50"], r["p95"], r["p99"])
        for r in histogram_quantiles(hist, ["source"], (0.5, 0.95, 0.99)).collect()
    }
    exact = {
        r["source"]: (r["e50"], r["e95"], r["e99"])
        for r in docs.groupBy("source")
        .agg(
            F.expr("percentile(nt, 0.5)").alias("e50"),
            F.expr("percentile(nt, 0.95)").alias("e95"),
            F.expr("percentile(nt, 0.99)").alias("e99"),
        )
        .collect()
    }
    assert set(got) == set(exact)
    for src in got:
        for g, e in zip(got[src], exact[src]):
            if e < 10:
                assert abs(g - e) <= 1
            else:
                assert abs(g - e) / e <= 0.06, (src, g, e)


def test_incremental_merge_equals_oneshot_and_replay(spark, tmp_path):
    docs = load(spark, SF_SMOKE, "documents").select(
        "source", F.size(F.split("text", " ")).cast("long").alias("nt")
    )
    table = TxTable(str(tmp_path / "hist"))
    for i in range(3):
        assert update_histogram_state(
            spark, docs.filter(F.col("nt") % 3 == i), table, ["source"], "nt",
            batch_id=f"b{i}",
        )
    # replay of an applied batch is a detected no-op
    assert not update_histogram_state(
        spark, docs.filter(F.col("nt") % 3 == 0), table, ["source"], "nt",
        batch_id="b0",
    )
    merged = {
        (r["source"], r["bucket"]): r["n"]
        for r in table.read(spark).collect()
    }
    oneshot = {
        (r["source"], r["bucket"]): r["n"]
        for r in histogram_counts(docs, ["source"], "nt").collect()
    }
    assert merged == oneshot
    q = read_quantile_state(spark, table, ["source"])
    assert q.count() == len({k[0] for k in oneshot})


def test_empty_state_reads_none(spark, tmp_path):
    assert read_quantile_state(spark, TxTable(str(tmp_path / "x")), ["k"]) is None


def test_negative_domain_mirrored_buckets(spark):
    """r11 VERDICT next #3: negatives get a MIRRORED decade family
    (x <= -10 → -20 - posbucket(-x)) instead of one singleton per
    value — bounded state cardinality, bit-identical across engines,
    globally value-monotone ids, and |mid| error within the same ~5%
    bucket width as the positive side."""
    from nfl_data_pipeline_spark.operators.sketches import (
        duck_bucket_mid,
        sp_bucket_mid,
    )

    vals = sorted(
        list(range(-130, 130))
        + [v * s for s in (1, -1)
           for v in (999, 1000, 1001, 9999, 10000, 10001,
                     10**9 - 1, 10**9, 10**12)]
    )
    sdf = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {
        r["x"]: (r["b"], r["m"])
        for r in sdf.select(
            "x",
            F.expr(sp_len_bucket("x")).alias("b"),
            F.expr(sp_bucket_mid(sp_len_bucket("x"))).alias("m"),
        ).collect()
    }
    con = duckdb.connect()
    for v in vals:
        db, dm = con.execute(
            f"SELECT {duck_len_bucket(str(v))}, "
            f"{duck_bucket_mid(duck_len_bucket(str(v)))}"
        ).fetchone()
        assert got[v] == (db, dm), f"engine mismatch at {v}"
    # ids monotone in x; exact singletons for |x| < 10
    ordered = [got[v][0] for v in vals]
    assert ordered == sorted(ordered)
    for v in range(-9, 10):
        assert got[v][1] == float(v)
    # mirrored family: bounded ids, midpoint within a bucket width,
    # and exact mirror symmetry with the positive side
    for v in vals:
        b, m = got[v]
        if v <= -10 and -v in got:
            pb, pm = got[-v]
            assert b == -20 - pb
            assert m == -pm
            assert abs(m - v) / abs(v) <= 0.055, (v, m)
    # state cardinality on a wide negative domain stays decade-bounded
    neg = spark.range(10, 100000).select((-F.col("id")).alias("x"))
    n_buckets = (
        neg.select(F.expr(sp_len_bucket("x")).alias("b")).distinct().count()
    )
    assert n_buckets <= 4 * 90  # ~90 per decade, 4 decades touched


def test_negative_quantile_recovery(spark):
    """Quantile recovery over a mixed-sign metric: cumulative-count
    walk needs no special casing because mirrored ids sort below the
    singletons. Checked against Spark's exact percentile."""
    df = spark.range(0, 20000).select(
        F.lit("k").alias("k"),
        (F.col("id") - 10000).cast("long").alias("v"),
    )
    hist = histogram_counts(df, ["k"], "v")
    got = histogram_quantiles(hist, ["k"], (0.05, 0.5, 0.95)).collect()[0]
    exact = df.agg(
        F.expr("percentile(v, 0.05)").alias("e5"),
        F.expr("percentile(v, 0.5)").alias("e50"),
        F.expr("percentile(v, 0.95)").alias("e95"),
    ).collect()[0]
    assert abs(got["p5"] - exact["e5"]) / abs(exact["e5"]) <= 0.06
    assert abs(got["p50"] - exact["e50"]) <= 1  # median lands in singletons
    assert abs(got["p95"] - exact["e95"]) / abs(exact["e95"]) <= 0.06


def test_hist_scheme_guard_refuses_foreign_state(spark, tmp_path):
    """r12 review: the mirrored negative family REINTERPRETS ids
    <= -20, so state written under another (or no) scheme stamp must
    refuse both merge and read instead of decoding wrong midpoints
    and double-representing values under two ids."""
    from nfl_data_pipeline_spark.operators.sketches import (
        HIST_SCHEME,
        check_hist_scheme,
    )

    docs = spark.range(100).select(
        F.lit("k").alias("source"), (F.col("id") + 1).alias("nt")
    )
    # fresh state: stamped on first merge, round-trips
    table = TxTable(str(tmp_path / "fresh"))
    assert update_histogram_state(
        spark, docs, table, ["source"], "nt", batch_id="b0"
    )
    assert table.meta().get("hist_scheme") == HIST_SCHEME
    assert read_quantile_state(spark, table, ["source"]).count() == 1

    # foreign state: same rows, committed WITHOUT the stamp (a
    # pre-r12 writer) -> merge and read both refuse
    old = TxTable(str(tmp_path / "old"))
    from nfl_data_pipeline_spark.operators.sketches import (
        histogram_counts as _hc,
    )

    state = _hc(docs, ["source"], "nt").withColumn(
        "_part", F.col("source")
    )
    old.commit(old.stage_files(state, "_part"), batch_id="legacy")
    with pytest.raises(ValueError, match="bucket scheme"):
        update_histogram_state(
            spark, docs, old, ["source"], "nt", batch_id="b1"
        )
    with pytest.raises(ValueError, match="bucket scheme"):
        read_quantile_state(spark, old, ["source"])
    with pytest.raises(ValueError, match="bucket scheme"):
        check_hist_scheme(old)


def test_histogram_excludes_null_metric_rows(spark):
    """r12 review: NULL metric values are excluded from the state —
    a NULL bucket row would shift cumulative counts differently per
    engine (Spark windows put NULLS FIRST, DuckDB's ORDER BY puts
    them last)."""
    df = spark.createDataFrame(
        [("k", 5), ("k", None), ("k", 500), ("k", None)],
        "g string, v long",
    )
    hist = histogram_counts(df, ["g"], "v")
    rows = hist.collect()
    assert sum(r["n"] for r in rows) == 2  # nulls dropped
    assert all(r["bucket"] is not None for r in rows)
    got = histogram_quantiles(hist, ["g"], (0.5,)).collect()[0]
    assert got["p50"] == 5.0  # exact singleton, nulls invisible
