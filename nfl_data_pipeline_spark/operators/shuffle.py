"""Deterministic seeded global shuffle — the step between a curated
corpus and training-shard output: every epoch needs the corpus in a
fresh pseudo-random order, reproducibly, without materializing a
permutation or paying a true global sort.

Design (100 TB posture):

- The shuffle key is an AFFINE PERMUTATION over the prime field
  Z_P (P = 2^31 - 1): ``k = (A * (id mod P) + B) mod P`` with
  epoch-derived A ∈ [1, P-1], B ∈ [0, P-1]. A map-only, stateless
  expression — no RNG column to persist, no permutation table to
  join, and a new epoch seed is a brand-new order for free. Ids
  above P collide on the key; ``(k, id)`` stays a total order, so
  determinism survives arbitrary id ranges.
- All arithmetic stays in exact int64: A < 2^31 and (id mod P) < 2^31
  keep the product under 2^62 — no wrap, no double rounding, and the
  same expression evaluates bit-identically in any ANSI engine
  (the DuckDB oracle mirrors it literally).
- Shard assignment is ``k mod n_shards`` (map-only); writing each
  shard in key order needs ONE hash shuffle on the shard id plus a
  sort WITHIN each shard (``repartition`` + ``sortWithinPartitions``)
  — there is never a global sort or a single-reducer order-by.
  Readers streaming shards round-robin see the blocked-uniform order
  training loaders expect.

Why an LCG-style permutation and not ``F.rand(seed)``: rand() is
per-task-attempt nondeterministic under retries/repartition (Spark
seeds per partition), while the affine key is a pure function of the
id — replay-safe, resumable mid-epoch, and testable against an
oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: prime modulus (Mersenne, 2^31 - 1): big enough that fixture and
#: production ids spread, small enough that A * (id mod P) stays
#: exact in int64 (and in the oracle's arithmetic).
SHUFFLE_P = 2_147_483_647


def shuffle_params(seed: int) -> tuple[int, int]:
    """Epoch seed → (A, B) of the affine permutation, A never 0 mod P
    (a zero multiplier would collapse the field to one point). Plain
    Python big-int arithmetic — exact, portable, documented so the
    oracle can inline the resolved constants."""
    a = (seed * 2_654_435_761 + 1) % (SHUFFLE_P - 1) + 1
    b = (seed * 40_503 + 7) % SHUFFLE_P
    return a, b


def shuffle_key(id_col: str, seed: int) -> Column:
    """The epoch-``seed`` shuffle key for non-negative int64 ids:
    ``(A * (id % P) + B) % P`` in exact int64 arithmetic."""
    a, b = shuffle_params(seed)
    return F.expr(
        f"pmod({a} * pmod({id_col}, {SHUFFLE_P}) + {b}, {SHUFFLE_P})"
    ).cast("long")


def keyed_ranges(
    df: DataFrame,
    seed: int,
    id_col: str,
    key_col: str,
    n_ranges: int,
) -> DataFrame:
    """Map-only attach of the epoch shuffle key + its key-space range
    id — the shared unit of every two-pass range prefix sum
    (size-aware shards, PPS sampling). Integer DIV, never ``/``:
    long/long routes through double, whose rounding at a range
    boundary differs across engines (key < 2^31 and n_ranges ≤ 2^20
    keep the product in int64)."""
    return df.withColumn(key_col, shuffle_key(id_col, seed)).withColumn(
        "_rng", F.expr(f"({key_col} * {n_ranges}) DIV {SHUFFLE_P}")
    )


def prefix_offsets(totals: dict) -> tuple[dict, int]:
    """Driver-side prefix sum over per-range totals → (range id →
    cumulative weight BEFORE the range, grand total). A None key (a
    NULL-id row's NULL range) is excluded from the arithmetic —
    callers decide whether such rows are kept (shards) or dropped
    (sampling)."""
    offsets, acc = {}, 0
    for rng_id in sorted(k for k in totals if k is not None):
        offsets[rng_id] = acc
        acc += totals[rng_id]
    return offsets, acc


def shuffled_shards(
    df: DataFrame,
    seed: int,
    n_shards: int,
    id_col: str = "doc_id",
    key_col: str = "shuffle_key",
    shard_col: str = "shard",
) -> DataFrame:
    """Shard-ready frame: shuffle key + shard id attached, rows
    hash-clustered on the shard id (a partition may hold several
    shards — hash partitioning does not map shard i to partition i —
    but every shard lives whole in exactly one partition) and sorted
    ``(shard, key, id)`` within partitions, so each shard's rows are
    contiguous and in epoch order. Write with
    ``.write.partitionBy(shard_col)`` — the per-shard files come out
    already ordered. ONE shuffle, no global sort."""
    keyed = df.withColumn(key_col, shuffle_key(id_col, seed)).withColumn(
        shard_col, F.pmod(F.col(key_col), F.lit(n_shards)).cast("long")
    )
    return keyed.repartition(n_shards, F.col(shard_col)).sortWithinPartitions(
        shard_col, key_col, id_col
    )


def shuffled_shards_weighted(
    df: DataFrame,
    seed: int,
    target_weight: int,
    weight_col: str,
    id_col: str = "doc_id",
    key_col: str = "shuffle_key",
    shard_col: str = "shard",
    n_ranges: int = 1024,
) -> DataFrame:
    """Size-aware sharding over the SAME epoch order: shard
    boundaries fall on cumulative WEIGHT (bytes / tokens), not row
    count. ``shuffled_shards`` gives every shard ~equal rows, but a
    training corpus's document sizes are heavily skewed, so
    equal-row shards are unequal-byte files; here shard i holds the
    permuted-order run of documents whose preceding cumulative
    weight lies in [i * target_weight, (i+1) * target_weight) — each
    shard lands within one document of the target.

    The cumulative weight over the permuted order needs NO global
    sort: the shuffle key is uniform over [0, P), so the key space
    splits into ``n_ranges`` equal slices; (1) a map-only range id,
    (2) per-range weight totals (``n_ranges`` rows to the driver),
    (3) a driver-side prefix sum over those totals (broadcast back),
    (4) a window WITHIN each range ordered by (key, id) adds the
    in-range running weight to the range's offset. One hash exchange
    for the window, one for the final shard clustering — same
    exchange count class as the row-sharded path, plus an
    O(n_ranges) driver step.

    Weights must be non-negative; NULL weighs 0 (the doc rides the
    boundary decision of its predecessor), and a NULL id yields a
    NULL shard (the same tolerance as ``shuffled_shards``). Exact
    int64 throughout: a 100 TB corpus's total bytes (~1e14) is 4
    orders of magnitude under int64; overflow would need a zettabyte
    corpus. The keyed frame is pinned (localCheckpoint) before the
    two passes — correctness under a nondeterministic upstream is
    non-negotiable, and it halves the corpus scans.

    Skew caveat (the honest bound): the RANGES are uniform in key
    count, not weight — one range's window still processes its own
    rows in one task. At 100 TB with n_ranges=1024 each range holds
    ~100 GB of metadata rows (id + weight only, the payload is not
    in this frame); raise n_ranges to keep per-range row counts
    inside executor memory.

    The decision passes really are metadata-only (r12): the keyed
    frame pins just (id, weight, key, range) — the totals collect,
    the prefix-sum window and its exchange never carry the document
    payload. The (id, shard) verdicts re-attach through a broadcast
    left join gated on the EXACT row count that rides the totals
    aggregate (no count action, r13; narrow rows — the 4M-row gate
    default is ~64 MB), so in the broadcast regime the payload
    crosses exactly ONE exchange (the shard clustering); past the
    gate the attach degrades to an id-keyed shuffle join — two
    payload exchanges, the same count this operator paid before r12
    when it windowed the payload directly.

    Input contract (r13, checked for free in the totals pass):
    ``id_col`` must be unique among non-NULL ids — the verdict
    re-attach joins on the id, so duplicates would fan out; they
    raise ``ValueError``. ``df`` is evaluated twice (decision pin +
    payload attach): pin nondeterministic upstreams
    (``sample()``, post-shuffle ``limit``) with ``localCheckpoint``
    first, or payload rows absent from the pin silently get NULL
    shards."""
    from pyspark.sql.window import Window

    from nfl_data_pipeline_spark.operators.hints import (
        metadata_gated_broadcast,
    )

    # PIN the narrow keyed frame: the range-totals pass and the
    # window pass must see the SAME rows — a nondeterministic
    # upstream (sample, post-shuffle limit) would otherwise give
    # offsets from one row set and windows over another, silently
    # corrupting every shard boundary. The pin carries only
    # (id, weight, key, range); parquet column pruning makes its
    # derivation a narrow scan.
    keyed = keyed_ranges(
        df.select(id_col, weight_col), seed, id_col, key_col, n_ranges
    ).localCheckpoint(eager=True)
    w = F.coalesce(F.col(weight_col).cast("long"), F.lit(0))
    stats = keyed.groupBy("_rng").agg(
        F.sum(w).alias("t"),
        F.count("*").alias("_n"),
        F.count(id_col).alias("_ni"),
        F.countDistinct(id_col).alias("_nd"),
    ).collect()
    totals = {r["_rng"]: r["t"] for r in stats}
    n_rows = sum(r["_n"] for r in stats)  # incl. NULL-id rows
    n_dup = sum(r["_ni"] for r in stats) - sum(r["_nd"] for r in stats)
    if n_dup:
        raise ValueError(
            f"shuffled_shards_weighted: {n_dup} duplicate {id_col} "
            "row(s) — the shard re-attach joins on the id, so "
            "duplicates would fan out; deduplicate (or re-key) first"
        )
    # a NULL id yields a NULL key/range: keep the row (NULL shard,
    # matching shuffled_shards' tolerance); prefix_offsets excludes
    # it from the arithmetic rather than crashing the driver sort
    offsets, _ = prefix_offsets(totals)
    # dense array literal indexed by _rng: O(1) per row, where a map
    # literal would linear-scan its n_ranges keys for every row
    off_arr = F.array(
        *[F.lit(offsets.get(i, 0)) for i in range(n_ranges)]
    )
    win = (
        Window.partitionBy("_rng")
        .orderBy(key_col, id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before = F.coalesce(F.sum(w).over(win), F.lit(0)) + F.element_at(
        off_arr, (F.col("_rng") + 1).cast("int")
    )
    verdicts = (
        keyed.withColumn("_cumb", cum_before)
        .select(
            id_col,
            # integer DIV again: cum_before can exceed 2^53 on a big
            # corpus, where double division silently loses bits
            F.expr(f"_cumb DIV {target_weight}").alias(shard_col),
        )
    )
    # left join: a NULL-id payload row matches nothing and keeps its
    # NULL shard, exactly as the pre-r12 inline window produced. The
    # shuffle key is recomputed on the payload side (a pure function
    # of the id) rather than carried through the verdict join. The
    # verdict row count is exactly n_rows (one per pinned row) and
    # known driver-side — the gate costs no action, and the single
    # consumer evaluates the window once off the pinned frame.
    attach = metadata_gated_broadcast(
        verdicts, n_rows, site="shuffle.py:shard-attach"
    )
    sharded = (
        df.join(attach, [id_col], "left")
        .withColumn(key_col, shuffle_key(id_col, seed))
        .select(*df.columns, key_col, shard_col)
    )
    return sharded.repartition(F.col(shard_col)).sortWithinPartitions(
        shard_col, key_col, id_col
    )
