"""Hypothesis property tests: cross-engine hash parity on arbitrary
strings, banker's-rounding parity with Python, Jaccard bounds."""

from __future__ import annotations

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from nfl_data_pipeline_spark.operators.hashing import (
    P,
    duck_rolling_hash,
    sp_rolling_hash,
)

# printable-ascii strings without the quote chars that would need SQL
# escaping (escaping is an orthogonal concern)
_texts = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126, exclude_characters="'\\"),
    min_size=0,
    max_size=60,
)


def py_rolling_hash(s: str) -> int:
    h = 0
    for ch in s:
        h = (h * 31 + ord(ch)) % P
    return h


@settings(max_examples=60, deadline=None)
@given(_texts)
def test_duck_rolling_hash_matches_python(s: str):
    con = duckdb.connect()
    got = con.execute(f"SELECT {duck_rolling_hash(repr(s))}").fetchone()[0]
    # duckdb list_reduce over empty list with prepended 0 → 0
    assert (got or 0) == py_rolling_hash(s)


def test_spark_rolling_hash_matches_python_bulk(spark):
    # one Spark job over many strings beats one job per hypothesis
    # example; the strings exercise length 0..60 and odd characters
    samples = ["", "a", "key agg", "Zz 09~!", "x" * 60, "spark graft", " "]
    df = spark.createDataFrame([(s,) for s in samples], ["s"])
    from pyspark.sql import functions as F

    got = [
        r["h"] for r in df.select(F.expr(sp_rolling_hash("s")).alias("h")).collect()
    ]
    assert got == [py_rolling_hash(s) for s in samples]


@settings(max_examples=40, deadline=None)
@given(st.floats(min_value=-1e6, max_value=1e6, allow_nan=False))
def test_bround_matches_python_bankers(spark_bround, x: float):
    # Python round() is banker's rounding, same as R round / Spark bround
    assert spark_bround(x) == pytest.approx(round(x), abs=1e-9)


@pytest.fixture(scope="module")
def spark_bround(spark):
    """Evaluate bround through one reusable Spark plan (collecting a
    1-row dataframe per hypothesis example would be minutes)."""
    from pyspark.sql import functions as F

    cache: dict[float, float] = {}

    def run(x: float) -> float:
        if x not in cache:
            df = spark.createDataFrame([(float(x),)], ["v"])
            cache[x] = df.select(F.bround("v", 0).alias("r")).collect()[0]["r"]
        return cache[x]

    return run


def test_jaccard_bounds_and_symmetry(spark):
    from nfl_data_pipeline_spark.catalog import load
    from nfl_data_pipeline_spark.operators.dedup import jaccard_pairs
    from tests.conftest import SF_SMOKE

    pairs = jaccard_pairs(load(spark, SF_SMOKE, "documents"), threshold=0.0)
    pdf = pairs.toPandas()
    assert pdf["jaccard"].between(0, 1).all()
    assert (pdf["doc_a"] < pdf["doc_b"]).all()  # canonical pair order
    assert not pdf.duplicated(["doc_a", "doc_b"]).any()


def test_asof_join_edge_semantics(spark):
    """Backward as-of join: equal-ts matches (<= bound), latest prior
    wins, no-prior-row keeps NULLs, keys never cross."""
    from nfl_data_pipeline_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 205), (3, "a", 50), (4, "b", 100)],
        "id long, k string, t long",
    )
    right = spark.createDataFrame(
        [("a", 100, 1.0), ("a", 200, 2.0), ("c", 10, 9.0)],
        "k string, t long, v double",
    )
    out = {
        r["id"]: (r["t_asof"], r["v_asof"])
        for r in asof_join(
            left, right, by=["k"], on="t", value_cols=["t", "v"]
        ).collect()
    }
    assert out[1] == (100, 1.0)   # equal ts matches (inclusive bound)
    assert out[2] == (200, 2.0)   # latest prior, not first
    assert out[3] == (None, None)  # nothing at or before t=50
    assert out[4] == (None, None)  # key b has no right rows at all


def test_asof_join_null_on_right_rows_dropped(spark):
    """A right row with NULL `on` can never satisfy right.on <=
    left.on; it must not be carried into left rows that have no real
    prior match (DuckDB ASOF drops NULL-timestamp rows too)."""
    from nfl_data_pipeline_spark.operators.relational import asof_join

    left = spark.createDataFrame(
        [(1, "a", 50), (2, "a", 150)], "id long, k string, t long"
    )
    right = spark.createDataFrame(
        [("a", None, 666.0), ("a", 100, 1.0)],
        "k string, t long, v double",
    )
    out = {
        r["id"]: (r["t_asof"], r["v_asof"])
        for r in asof_join(
            left, right, by=["k"], on="t", value_cols=["t", "v"]
        ).collect()
    }
    assert out[1] == (None, None)  # NULL-ts row must NOT back-fill
    assert out[2] == (100, 1.0)


def test_range_join_edge_semantics(spark):
    """Bin-bucketed range join: inclusive bounds, multi-bin intervals
    found from any bin, overlapping intervals each pair once (no
    bin-replication duplicates), keys never cross."""
    from nfl_data_pipeline_spark.operators.relational import range_join

    points = spark.createDataFrame(
        [(1, "a", 100), (2, "a", 250), (3, "a", 9), (4, "b", 100)],
        "id long, k string, p long",
    )
    intervals = spark.createDataFrame(
        # [100,200]: touches both bounds; [40,260]: spans 23 bins at
        # w=10 and overlaps the first; key c never matches
        [("a", 100, 200, "i1"), ("a", 40, 260, "i2"), ("c", 0, 999, "i3")],
        "k string, lo long, hi long, iv string",
    )
    out = range_join(
        points, intervals, by=["k"], point_col="p",
        lo_col="lo", hi_col="hi", bin_width=10,
    )
    got = sorted((r["id"], r["iv"]) for r in out.collect())
    assert got == [(1, "i1"), (1, "i2"), (2, "i2")]


def test_connected_components_chain_and_islands(spark):
    """Min-label propagation: a 4-node chain collapses to one
    component (needs >1 iteration — labels must travel the chain),
    disjoint pairs stay separate, direction of pair entry is
    irrelevant."""
    from nfl_data_pipeline_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(4, 3), (3, 2), (2, 1), (10, 11), (20, 12)],
        "doc_a long, doc_b long",
    )
    got = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert got == {
        1: 1, 2: 1, 3: 1, 4: 1,
        10: 10, 11: 10,
        12: 12, 20: 12,
    }


def test_connected_components_paths_agree(spark):
    """The driver union-find fast path and the distributed min-label
    loop return identical (node, component) labels — forced onto the
    distributed path via driver_max_pairs=0 on the same random-ish
    graph (chains, a star, islands, both entry directions, a
    self-pair)."""
    from nfl_data_pipeline_spark.operators.dedup import connected_components

    edges = [
        (4, 3), (3, 2), (2, 1),          # chain
        (50, 51), (50, 52), (50, 53),    # star rooted above min
        (7, 7),                          # self-pair
        (100, 90), (90, 95),             # reversed entries
        (200, 201),
    ]
    pairs = spark.createDataFrame(edges, "doc_a long, doc_b long")
    fast = {
        (r["node"], r["component"])
        for r in connected_components(pairs).collect()
    }
    dist = {
        (r["node"], r["component"])
        for r in connected_components(pairs, driver_max_pairs=0).collect()
    }
    assert fast == dist
    assert (50, 50) in fast and (53, 50) in fast and (7, 7) in fast


def test_sequence_packing_invariants(spark):
    """Concat-and-chunk invariants, recomputed independently in
    pandas: bins partition each shard's docs contiguously in doc_id
    order, token mass is conserved, and every bin except a shard's
    last one ends at-or-past its chunk boundary (a doc is assigned to
    the bin its FIRST token lands in, so a bin's cumulative span can
    overhang the boundary, but can never end short of it)."""
    import pandas as pd

    from nfl_data_pipeline_spark.catalog import load
    from nfl_data_pipeline_spark.queries import all_queries
    from nfl_data_pipeline_spark.queries.llmprep import _PACK_BUDGET
    from tests.conftest import SF_CORRECT

    full = (
        all_queries()["sequence_packing"].spark(spark, SF_CORRECT).toPandas()
    )
    # pass-1 packing columns (the rebalance columns merged_bin /
    # merged_tokens are pandas-recomputed separately below). The
    # query's row order is plan-dependent (the driver's hash compare
    # sorts rows; so must we).
    got = (
        full.drop(columns=["merged_bin", "merged_tokens"])
        .sort_values(["source", "bin_id"])
        .reset_index(drop=True)
    )

    docs = (
        load(spark, SF_CORRECT, "documents")
        .select("doc_id", "source", "text")
        .toPandas()
    )
    docs["n_tokens"] = docs["text"].str.split(" ").str.len()
    docs = docs.sort_values(["source", "doc_id"])
    docs["cum"] = docs.groupby("source")["n_tokens"].cumsum()
    docs["bin_id"] = (docs["cum"] - docs["n_tokens"]) // _PACK_BUDGET

    want = (
        docs.groupby(["source", "bin_id"])
        .agg(
            n_docs=("doc_id", "size"),
            bin_tokens=("n_tokens", "sum"),
            first_doc=("doc_id", "min"),
            last_doc=("doc_id", "max"),
        )
        .reset_index()
        .sort_values(["source", "bin_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.astype({"bin_id": "int64", "n_docs": "int64",
                    "bin_tokens": "int64"}),
        want.astype({"bin_id": "int64", "n_docs": "int64",
                     "bin_tokens": "int64"}),
        check_dtype=False,
    )

    for src, g in got.groupby("source"):
        g = g.sort_values("bin_id")
        # contiguous bins, contiguous doc ranges
        assert list(g["bin_id"]) == list(range(len(g)))
        assert (g["first_doc"].values[1:] > g["last_doc"].values[:-1]).all()
        # token conservation per shard
        assert g["bin_tokens"].sum() == int(
            docs.loc[docs["source"] == src, "n_tokens"].sum()
        )
        # every non-final bin reaches its chunk boundary
        ends = g["bin_tokens"].cumsum().values
        bounds = (g["bin_id"].values + 1) * _PACK_BUDGET
        assert (ends[:-1] >= bounds[:-1]).all()

    # rebalance columns: underfull bins (and only those) carry a
    # merged assignment, recomputed by the window-chunk rule
    from nfl_data_pipeline_spark.queries.llmprep import _REB_MIN

    under = full[full["bin_tokens"] < _REB_MIN]
    fullbins = full[full["bin_tokens"] >= _REB_MIN]
    assert fullbins["merged_bin"].isna().all()
    assert under["merged_bin"].notna().all()
    u = under.sort_values(
        ["bin_tokens", "source", "bin_id"], ascending=[False, True, True]
    )
    cum = u["bin_tokens"].cumsum()
    want_merged = ((cum - u["bin_tokens"]) // _PACK_BUDGET).astype("int64")
    assert list(u["merged_bin"].astype("int64")) == list(want_merged)
    want_totals = u.groupby(want_merged)["bin_tokens"].transform("sum")
    assert list(u["merged_tokens"].astype("int64")) == list(
        want_totals.astype("int64")
    )


def test_repetition_signals_planted_docs(spark, tmp_path):
    """Planted extremes: a one-word loop maxes every signal; a
    all-distinct doc zeroes dup_word_frac; the flag fires only on the
    repetitive ones."""
    import os

    import pandas as pd

    from nfl_data_pipeline_spark.queries import all_queries

    docs = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "spam " * 49 + "spam",             # 50× one word
                " ".join(f"w{i}" for i in range(40)),  # all distinct
                "a b " * 19 + "a b",               # one bigram loop
            ],
            "lang": ["en"] * 3,
            "source": ["s"] * 3,
            "n_chars": [0, 0, 0],
        }
    )
    d = str(tmp_path / "sf")
    os.makedirs(d)
    docs.to_parquet(os.path.join(d, "documents.parquet"))
    got = {
        r["doc_id"]: r
        for r in all_queries()["repetition_signals"]
        .spark(spark, d)
        .collect()
    }
    assert got[0]["dup_word_frac"] == pytest.approx(1 - 1 / 50)
    assert got[0]["top_word_share"] == 1.0
    assert got[0]["repetitive"] == 1
    assert got[1]["dup_word_frac"] == 0.0
    assert got[1]["repetitive"] == 0
    # "a b a b ...": top bigram "b a"/"a b" covers ~half the words
    assert got[2]["top_bigram_share"] == pytest.approx(2 * 20 / 40)
    assert got[2]["repetitive"] == 1


def test_cluster_safe_split_never_straddles(spark):
    """The leakage-safety invariant of cluster_safe_split: split is a
    pure function of the cluster id, so every doc in a near-dup
    cluster lands in the SAME split — verified at doc grain on the
    sf0.001 documents table (not just by construction: this drives
    the real jaccard_pairs -> components -> assignment chain)."""
    from pyspark.sql import functions as F

    from nfl_data_pipeline_spark.catalog import load
    from nfl_data_pipeline_spark.operators import dedup as dd

    d = load(spark, "/root/testdata/sf0.001", "documents")
    # pair-source-agnostic: drive the SAME operator with the exact
    # jaccard generator and the corpus-linear banded minhash one
    for pairs in (
        dd.jaccard_pairs(d, threshold=0.5),
        dd.minhash_lsh_pairs(d),
    ):
        assigned = dd.assign_cluster_splits(d.select("doc_id"), pairs)
        # at least one real multi-doc cluster, else it's vacuous
        sizes = assigned.groupBy("cluster_id").count()
        assert sizes.filter(F.col("count") > 1).count() > 0
        straddlers = (
            assigned.groupBy("cluster_id")
            .agg(F.countDistinct("split").alias("n_splits"))
            .filter(F.col("n_splits") > 1)
        )
        assert straddlers.count() == 0


def test_split_bucket_exact_at_extreme_keys(spark):
    """operators/hashing.split_bucket must equal Python big-int
    arithmetic at int64-extreme keys in BOTH engines: the naive
    key*A form wraps silently in Spark and raises an overflow error
    in DuckDB once keys pass ~2.4e10 — the mod-first form never
    leaves int64."""
    import duckdb

    from nfl_data_pipeline_spark.operators.hashing import (
        SPLIT_A,
        SPLIT_B,
        SPLIT_P,
        split_bucket,
    )

    keys = [-(2**63) + 1, -(2**62), -97, 0, 1, 97, 2_400_000_000, 2**62, 2**63 - 1]
    want = [((k % SPLIT_P) * SPLIT_A + SPLIT_B) % SPLIT_P % 100 for k in keys]
    sdf = spark.createDataFrame([(k,) for k in keys], "k long")
    got_spark = [
        r["b"]
        for r in sdf.selectExpr(f"{split_bucket('k')} AS b", "k")
        .orderBy("k")
        .collect()
    ]
    assert got_spark == want
    con = duckdb.connect()
    got_duck = [
        r[0]
        for r in con.execute(
            "SELECT " + split_bucket("k") + " FROM (SELECT unnest(?) AS k) "
            "ORDER BY k",
            [keys],
        ).fetchall()
    ]
    assert got_duck == want
