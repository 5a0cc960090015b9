"""Deterministic seeded global shuffle (operators/shuffle.py): the
epoch-keyed affine permutation and the shard-clustered write shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.operators.shuffle import (
    SHUFFLE_P,
    shuffle_key,
    shuffle_params,
    shuffled_shards,
)
from tests.conftest import SF_SMOKE


def test_shuffle_key_is_a_permutation_below_p(spark):
    """For ids < P the affine map is a bijection on Z_P: no key
    collisions, and the key matches the pure-Python formula."""
    n = 5_000
    a, b = shuffle_params(11)
    df = spark.range(n).select(F.col("id").alias("doc_id"))
    rows = df.select(
        "doc_id", shuffle_key("doc_id", 11).alias("k")
    ).collect()
    keys = [r["k"] for r in rows]
    assert len(set(keys)) == n  # injective
    assert all(
        r["k"] == (a * (r["doc_id"] % SHUFFLE_P) + b) % SHUFFLE_P
        for r in rows
    )


def test_epoch_seeds_give_distinct_reproducible_orders(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id")

    def order(seed):
        return tuple(
            r["doc_id"]
            for r in docs.select(
                "doc_id", shuffle_key("doc_id", seed).alias("k")
            )
            .orderBy("k", "doc_id")
            .collect()
        )

    e0, e0_again, e1 = order(0), order(0), order(1)
    assert e0 == e0_again  # reproducible (unlike F.rand under retry)
    assert e0 != e1  # a new epoch is a new permutation
    assert sorted(e0) == sorted(e1)  # …of the same corpus


def test_shards_are_clustered_ordered_and_balanced(spark):
    docs = load(spark, SF_SMOKE, "documents").select("doc_id")
    n_docs = docs.count()
    n_shards = 8
    sh = shuffled_shards(docs, seed=5, n_shards=n_shards)

    # within every physical partition rows are (shard, key, id)-
    # ordered — each shard's rows are contiguous and in epoch order,
    # exactly what write.partitionBy(shard) preserves per file — and
    # no shard is split across partitions
    def check_part(it):
        prev = None
        shards = set()
        for row in it:
            cur = (row["shard"], row["shuffle_key"], row["doc_id"])
            assert prev is None or prev <= cur
            prev = cur
            shards.add(row["shard"])
        yield list(shards)

    parts = sh.rdd.mapPartitions(check_part).collect()
    all_shards = [s for p in parts for s in p]
    assert len(all_shards) == len(set(all_shards))  # shards unsplit
    assert set(all_shards) == set(range(n_shards))

    # balance: affine keys spread uniformly — no shard holds more
    # than 2x its fair share on the fixture corpus
    counts = [
        r["n"]
        for r in sh.groupBy("shard").agg(F.count("*").alias("n")).collect()
    ]
    assert len(counts) == n_shards
    assert max(counts) <= 2 * (n_docs / n_shards)


def test_shuffle_plan_has_single_exchange(spark):
    """Scale posture: shard clustering is ONE hash exchange + an
    in-partition sort — no global sort, no extra shuffle."""
    docs = load(spark, SF_SMOKE, "documents").select("doc_id")
    plan = (
        shuffled_shards(docs, seed=5, n_shards=8)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    # the one exchange is hash-on-shard; a global sort would show up
    # as a rangepartitioning exchange
    assert "rangepartitioning" not in plan.lower()
    assert "Sort" in plan


def test_token_budget_mixture_sums_exactly_to_budget(spark):
    """Hamilton allocation invariants (beyond the oracle hash): the
    integer quotas sum EXACTLY to the budget, each domain gets at most
    one remainder token, and allocation error vs the real-valued
    proportional share is strictly below 1 token per domain."""
    from nfl_data_pipeline_spark.queries.llmprep import (
        _MIX_BUDGET,
        token_budget_mixture,
    )

    rows = token_budget_mixture(spark, SF_SMOKE).collect()
    assert sum(r["alloc_tokens"] for r in rows) == _MIX_BUDGET
    assert all(r["extra"] in (0, 1) for r in rows)
    total = sum(r["domain_tokens"] for r in rows)
    for r in rows:
        ideal = _MIX_BUDGET * r["domain_tokens"] / total
        assert abs(r["alloc_tokens"] - ideal) < 1.0


def test_shuffle_params_always_valid():
    """Property: for ANY seed (negative, huge, zero) the affine
    multiplier is in [1, P-1] (never 0 mod P — a zero multiplier
    collapses the permutation) and the offset is in [0, P-1]; the
    resulting map is a bijection on Z_P because P is prime."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=300, deadline=None)
    @given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
    def check(seed):
        a, b = shuffle_params(seed)
        assert 1 <= a <= SHUFFLE_P - 1
        assert 0 <= b <= SHUFFLE_P - 1

    check()


def test_partitioned_write_files_are_in_epoch_order(spark, tmp_path):
    """The documented write path: write.partitionBy(shard) over the
    shard-clustered frame produces per-shard files whose ROW ORDER is
    the epoch order — a training loader can stream them without any
    further sort."""
    import glob

    import pyarrow.parquet as pq

    docs = load(spark, SF_SMOKE, "documents").select("doc_id")
    n_docs = docs.count()
    out = str(tmp_path / "shards")
    (
        shuffled_shards(docs, seed=9, n_shards=4)
        .write.partitionBy("shard")
        .parquet(out)
    )
    seen = 0
    for d in sorted(glob.glob(out + "/shard=*")):
        shard = int(d.rsplit("=", 1)[1])
        for f in sorted(glob.glob(d + "/*.parquet")):
            t = pq.read_table(f)
            keys = t.column("shuffle_key").to_pylist()
            ids = t.column("doc_id").to_pylist()
            rows = list(zip(keys, ids))
            assert rows == sorted(rows), f"unordered file in shard {shard}"
            assert all(k % 4 == shard for k in keys)
            seen += len(rows)
    assert seen == n_docs


def test_hamilton_allocation_exact_at_int64_scale(spark):
    """Code-review r7: budget * domain_tokens overflows int64 for
    real-scale domains (Spark's non-ANSI long would WRAP silently and
    the quotas would no longer sum to the budget). The decimal-wide
    operator must match Python big-int arithmetic bit-for-bit even
    with domain token counts near the int64 maximum."""
    from nfl_data_pipeline_spark.queries.llmprep import (
        hamilton_token_allocation,
    )

    budget = 1_000_003
    toks = {
        "web": 5_000_000_000_000_000_000,
        "code": 9_223_372_036_854_775_000,
        "tiny": 123,
        "books": 7_777_777_777_777,
    }
    d = spark.createDataFrame(
        [(k, v) for k, v in toks.items()],
        "source string, domain_tokens long",
    )
    got = {
        r["source"]: (r["base_quota"], r["extra"], r["alloc_tokens"])
        for r in hamilton_token_allocation(d, budget).collect()
    }
    # python big-int oracle
    total = sum(toks.values())
    base = {k: (budget * v) // total for k, v in toks.items()}
    rem = {k: (budget * v) % total for k, v in toks.items()}
    leftover = budget - sum(base.values())
    ranked = sorted(toks, key=lambda k: (-rem[k], k))
    extra = {k: 1 if ranked.index(k) < leftover else 0 for k in toks}
    want = {k: (base[k], extra[k], base[k] + extra[k]) for k in toks}
    assert got == want
    assert sum(v[2] for v in got.values()) == budget


def test_weighted_shards_match_global_sort_recompute(spark):
    """shuffled_shards_weighted: the range-bucketed two-pass prefix
    sum must equal the naive global-sort cumulative sum exactly —
    shard = floor(cum_before / target) for every row."""
    from nfl_data_pipeline_spark.operators.shuffle import (
        shuffle_params,
        SHUFFLE_P,
        shuffled_shards_weighted,
    )

    import random

    rng = random.Random(11)
    rows = [(i, rng.randint(1, 900)) for i in range(2_000)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    target = 25_000
    sh = shuffled_shards_weighted(
        df, seed=5, target_weight=target, weight_col="w", n_ranges=32
    )
    got = {r["doc_id"]: r["shard"] for r in sh.collect()}

    a, b = shuffle_params(5)
    keyed = sorted(
        ((a * (i % SHUFFLE_P) + b) % SHUFFLE_P, i, w) for i, w in rows
    )
    cum, want = 0, {}
    for k, i, w in keyed:
        want[i] = cum // target
        cum += w
    assert got == want


def test_weighted_shards_balance_bytes_on_skewed_corpus(spark):
    """The point of the operator: under a heavy-tailed size
    distribution, equal-ROW shards spread total weight wildly while
    weighted shards land within one max-document of the target."""
    from nfl_data_pipeline_spark.operators.shuffle import (
        shuffled_shards,
        shuffled_shards_weighted,
    )

    import random

    rng = random.Random(3)
    # pareto-ish: a few huge docs among many small ones
    rows = [
        (i, int(min(50_000, 100 / (rng.random() ** 1.5))))
        for i in range(3_000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    total = sum(w for _, w in rows)
    target = total // 16

    by_rows = (
        shuffled_shards(df, seed=9, n_shards=16)
        .groupBy("shard")
        .agg(F.sum("w").alias("t"))
        .collect()
    )
    by_weight = (
        shuffled_shards_weighted(
            df, seed=9, target_weight=target, weight_col="w", n_ranges=32
        )
        .groupBy("shard")
        .agg(F.sum("w").alias("t"))
        .collect()
    )
    row_spread = max(r["t"] for r in by_rows) / min(r["t"] for r in by_rows)
    max_doc = max(w for _, w in rows)
    # every weighted shard except the tail is within one document of
    # the target — a hard bound, not a statistical one
    full = sorted(r["t"] for r in by_weight)[:-1]
    assert all(target - max_doc <= t <= target + max_doc for t in full)
    # and the row-sharded spread is visibly worse on this corpus
    assert row_spread > 1.5, "fixture not skewed enough to test anything"
    w_full_spread = max(full) / min(t for t in full if t > 0)
    assert w_full_spread < row_spread


def test_weighted_shards_null_weight_and_determinism(spark):
    from nfl_data_pipeline_spark.operators.shuffle import (
        shuffled_shards_weighted,
    )

    rows = [(0, 10), (1, None), (2, 30), (3, 5), (4, None), (5, 100)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    one = {
        r["doc_id"]: r["shard"]
        for r in shuffled_shards_weighted(
            df, seed=2, target_weight=40, weight_col="w", n_ranges=4
        ).collect()
    }
    # a different physical layout must not change a single assignment
    two = {
        r["doc_id"]: r["shard"]
        for r in shuffled_shards_weighted(
            df.repartition(5), seed=2, target_weight=40, weight_col="w",
            n_ranges=4,
        ).collect()
    }
    assert one == two
    assert len(one) == 6  # null-weight rows kept (weigh 0)
    # a NULL id gets a NULL shard (shuffled_shards' tolerance), not a
    # driver crash in the offset arithmetic
    with_null = df.unionByName(
        spark.createDataFrame([(None, 7)], "doc_id long, w long")
    )
    got = {
        r["doc_id"]: r["shard"]
        for r in shuffled_shards_weighted(
            with_null, seed=2, target_weight=40, weight_col="w", n_ranges=4
        ).collect()
    }
    assert got[None] is None
    assert {k: v for k, v in got.items() if k is not None} == one


def test_weighted_shards_plan_has_no_global_sort(spark):
    """The scale contract: cumulative weights come from the
    range-bucketed two-pass prefix sum — the physical plan must
    contain NO rangepartitioning exchange (a global sort) and no
    single-partition exchange on the row path."""
    from nfl_data_pipeline_spark.operators.shuffle import (
        shuffled_shards_weighted,
    )

    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"), (F.col("id") % 97 + 1).alias("w")
    )
    sh = shuffled_shards_weighted(
        df, seed=1, target_weight=10_000, weight_col="w", n_ranges=16
    )
    plan = sh._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan, "global sort crept in"
    assert "Exchange SinglePartition" not in plan


# ---- deterministic weighted PPS sampling (operators/sampling.py) ----------


def _pps_python_recompute(rows, k, seed):
    """Independent pure-Python recompute of the systematic PPS comb:
    exact big-int arithmetic over the same (key, id) order."""
    from nfl_data_pipeline_spark.operators.sampling import offset_salt
    from nfl_data_pipeline_spark.operators.shuffle import shuffle_params

    a, b = shuffle_params(seed)
    keyed = sorted(
        ((a * (i % SHUFFLE_P) + b) % SHUFFLE_P, i, max(w or 0, 0))
        for i, w in rows
    )
    total = sum(w for _, _, w in keyed)
    if total <= 0 or k == 0:
        return {}
    r = offset_salt(seed) % total

    def ceil2(c):
        return (c * k - r + 2 * total - 1) // total

    out, c = {}, 0
    for _, i, w in keyed:
        m = ceil2(c + w) - ceil2(c)
        if m >= 1:
            out[i] = m
        c += w
    return out


def test_pps_sample_matches_python_and_is_exact_k(spark):
    from nfl_data_pipeline_spark.operators.sampling import (
        pps_systematic_sample,
    )

    rows = [(i, (i * 37) % 400 + 1) for i in range(500)]
    # plant a heavy doc (> 2 comb steps) and a zero-weight doc
    rows[7] = (7, 10_000)
    rows[8] = (8, 0)
    df = spark.createDataFrame(rows, "doc_id long, w long")
    k, seed = 53, 4
    got = {
        r["doc_id"]: r["n_copies"]
        for r in pps_systematic_sample(
            df, k=k, weight_col="w", seed=seed, n_ranges=16
        ).collect()
    }
    want = _pps_python_recompute(rows, k, seed)
    assert got == want
    assert sum(got.values()) == k, "telescoping total must be exact"
    assert 8 not in got, "zero-weight doc can never be drawn"
    # the heavy doc spans > 1 comb step: always drawn, multiplicity
    total = sum(max(w, 0) for _, w in rows)
    assert got[7] >= (10_000 * k) // total >= 2


def test_pps_sample_deterministic_under_repartition(spark):
    from nfl_data_pipeline_spark.operators.sampling import (
        pps_systematic_sample,
    )

    rows = [(i, (i * 13) % 90 + 1) for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, w long")
    a = {
        (r["doc_id"], r["n_copies"])
        for r in pps_systematic_sample(
            df, 29, "w", seed=9, n_ranges=8
        ).collect()
    }
    b = {
        (r["doc_id"], r["n_copies"])
        for r in pps_systematic_sample(
            df.repartition(7), 29, "w", seed=9, n_ranges=8
        ).collect()
    }
    assert a == b
    c = {
        (r["doc_id"], r["n_copies"])
        for r in pps_systematic_sample(
            df, 29, "w", seed=10, n_ranges=8
        ).collect()
    }
    assert a != c, "a new seed must be a new sample"


def test_pps_sample_edges(spark):
    from nfl_data_pipeline_spark.operators.sampling import (
        pps_systematic_sample,
    )

    df = spark.createDataFrame(
        [(1, 5), (None, 9), (2, None)], "doc_id long, w long"
    )
    out = pps_systematic_sample(df, 3, "w", seed=1).collect()
    # NULL id dropped, NULL weight never drawn → all 3 draws on doc 1
    assert {(r["doc_id"], r["n_copies"]) for r in out} == {(1, 3)}
    assert pps_systematic_sample(df, 0, "w", seed=1).count() == 0
    zero = spark.createDataFrame([(1, 0)], "doc_id long, w long")
    assert pps_systematic_sample(zero, 5, "w", seed=1).count() == 0


def test_pps_inclusion_probability_over_all_offsets():
    """Math invariant backing the operator's contract: summed over
    every offset r in [0, W), a doc's total multiplicity is exactly
    k * w — i.e. inclusion probability is k*w/W exactly (offset
    granularity 1)."""
    weights = [3, 1, 4, 1, 5, 9, 2, 6]
    total, k = sum(weights), 5
    draws = [0] * len(weights)
    for r in range(total):
        def ceil2(c):
            return (c * k - r + 2 * total - 1) // total
        c = 0
        for i, w in enumerate(weights):
            draws[i] += ceil2(c + w) - ceil2(c)
            c += w
    assert draws == [k * w for w in weights]


def test_pps_stratified_quotas_and_python_recompute(spark):
    from nfl_data_pipeline_spark.operators.sampling import (
        hamilton_quotas,
        offset_salt,
        pps_stratified_sample,
    )
    from nfl_data_pipeline_spark.operators.shuffle import shuffle_params

    rows = [
        (i, ["web", "books", "code"][i % 3], (i * 29) % 250 + 1)
        for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, src string, w long")
    k, seed = 41, 6
    out = pps_stratified_sample(
        df, k=k, weight_col="w", strata_col="src", seed=seed, n_ranges=8
    ).collect()
    got = {(r["doc_id"]): (r["src"], r["n_copies"]) for r in out}
    # per-stratum totals == Hamilton quotas, overall == k
    strata_w: dict = {}
    for i, s, w in rows:
        strata_w[s] = strata_w.get(s, 0) + w
    quotas = hamilton_quotas(strata_w, k)
    per = {}
    for _, (s, m) in got.items():
        per[s] = per.get(s, 0) + m
    assert per == {s: q for s, q in quotas.items() if q > 0}
    assert sum(per.values()) == k

    # within each stratum the draws match the single-stratum comb
    a, b = shuffle_params(seed)
    for s in quotas:
        sub = [(i, w) for i, st, w in rows if st == s]
        # the stratified comb uses salt % W_s (the stratum modulus),
        # so recompute manually rather than via _pps_python_recompute
        keyed = sorted(
            ((a * (i % SHUFFLE_P) + b) % SHUFFLE_P, i, w) for i, w in sub
        )
        tw = sum(w for _, _, w in keyed)
        r_s = offset_salt(seed) % tw
        ks = quotas[s]

        def ceil2(c):
            return (c * ks - r_s + 2 * tw - 1) // tw

        want, c = {}, 0
        for _, i, w in keyed:
            m = ceil2(c + w) - ceil2(c)
            if m >= 1:
                want[i] = m
            c += w
        assert {
            i: m for i, (st, m) in got.items() if st == s
        } == want


def test_hamilton_quotas_exact():
    from nfl_data_pipeline_spark.operators.sampling import hamilton_quotas

    q = hamilton_quotas({"a": 10, "b": 10, "c": 10}, 10)
    assert sum(q.values()) == 10 and set(q.values()) <= {3, 4}
    assert hamilton_quotas({"a": 0, "b": -5}, 7) == {"a": 0, "b": 0}
    # int64-extreme weights stay exact (Python big ints)
    big = (1 << 62) + 12345
    q = hamilton_quotas({"a": big, "b": big + 1}, 1_000_001)
    assert sum(q.values()) == 1_000_001


def test_pps_plan_has_no_global_sort(spark):
    """Scale contract for both samplers: the cumulative weights come
    from the range prefix sum — no rangepartitioning exchange (global
    sort) and no single-partition exchange anywhere on the row
    path."""
    from nfl_data_pipeline_spark.operators.sampling import (
        pps_stratified_sample,
        pps_systematic_sample,
    )

    df = spark.range(5_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 97 + 1).alias("w"),
        (F.col("id") % 5).cast("string").alias("src"),
    )
    flat = pps_systematic_sample(df, 101, "w", seed=2, n_ranges=16)
    plan = flat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan

    strat = pps_stratified_sample(df, 101, "w", "src", seed=2, n_ranges=16)
    plan = strat._jdf.queryExecution().executedPlan().toString()
    assert "Exchange rangepartitioning" not in plan
    assert "Exchange SinglePartition" not in plan
    # the per-stratum metadata joins must broadcast, not shuffle
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_corpus_assembly_composition(spark, tmp_path):
    """The composed corpus-assembly path (benchpipes.
    corpus_assembly_1p2m shape at toy scale): stratified PPS budget →
    size-aware shards. Exactly k draws survive to the shard output,
    and every full shard lands within one max-document of the
    target weight."""
    from nfl_data_pipeline_spark.operators.sampling import (
        pps_stratified_sample,
    )
    from nfl_data_pipeline_spark.operators.shuffle import (
        shuffled_shards_weighted,
    )

    df = spark.range(2_000).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("string").alias("src"),
        (F.col("id") % 50 * 3 + 10).cast("long").alias("w"),
    )
    sampled = pps_stratified_sample(
        df, k=101, weight_col="w", strata_col="src", seed=3, n_ranges=8
    ).withColumn("w_eff", (F.col("w") * F.col("n_copies")).cast("long"))
    sh = shuffled_shards_weighted(
        sampled, seed=4, target_weight=500, weight_col="w_eff", n_ranges=8
    )
    rows = sh.collect()
    assert sum(r["n_copies"] for r in rows) == 101
    per_shard = {}
    for r in rows:
        per_shard[r["shard"]] = per_shard.get(r["shard"], 0) + r["w_eff"]
    max_w = max(r["w_eff"] for r in rows)
    full = [s for s in per_shard if s < max(per_shard)]
    for s in full:
        assert per_shard[s] <= 500 + max_w


def test_duplicate_ids_rejected_by_attach_contract(spark):
    """r13 (VERDICT r12 #7 / ADVICE): the verdict re-attach joins on
    the id, so a duplicate id would fan out n x n instead of sampling
    each row independently — all three range-prefix-sum operators
    detect duplicates for FREE in their totals pass and refuse."""
    import pytest

    from nfl_data_pipeline_spark.operators.sampling import (
        pps_stratified_sample,
        pps_systematic_sample,
    )
    from nfl_data_pipeline_spark.operators.shuffle import (
        shuffled_shards_weighted,
    )

    dup = spark.createDataFrame(
        [(1, 5), (1, 7), (2, 3)], "doc_id long, w long"
    )
    with pytest.raises(ValueError, match="duplicate"):
        pps_systematic_sample(dup, 3, "w", seed=1).collect()
    with pytest.raises(ValueError, match="duplicate"):
        shuffled_shards_weighted(
            dup, seed=1, target_weight=10, weight_col="w", n_ranges=4
        ).collect()
    dup_s = spark.createDataFrame(
        [(1, "a", 5), (1, "a", 7), (2, "b", 3)],
        "doc_id long, src string, w long",
    )
    with pytest.raises(ValueError, match="duplicate"):
        pps_stratified_sample(
            dup_s, 3, "w", "src", seed=1
        ).collect()
    # multiple NULL ids are NOT duplicates (they never join): the
    # shard path keeps them with NULL shards as before
    nulls = spark.createDataFrame(
        [(None, 5), (None, 7), (2, 3)], "doc_id long, w long"
    )
    got = shuffled_shards_weighted(
        nulls, seed=1, target_weight=10, weight_col="w", n_ranges=4
    ).collect()
    assert len(got) == 3
    assert sum(1 for r in got if r["shard"] is None) == 2


def test_stratified_attach_keyed_by_id_and_stratum(spark):
    """The stratified verdict join is keyed on (id, stratum): same
    results as the id-only join under the unique-id contract, pinned
    here so a refactor back to id-only (which reopens the
    cross-strata fan-out hole) fails a test."""
    from pyspark.sql import functions as F

    from nfl_data_pipeline_spark.operators.sampling import (
        pps_stratified_sample,
    )

    rows = [(i, "s" + str(i % 3), 10 + i) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, src string, w long")
    out = pps_stratified_sample(df, 7, "w", "src", seed=3)
    assert out.agg(F.sum("n_copies")).first()[0] == 7
    # one row per drawn doc, never a fan-out
    assert out.count() == out.select("doc_id").distinct().count()
