"""Distributed Bloom filter over a string key column — the prefilter
that lets an incremental job test "is this key already in the
registry?" WITHOUT joining the (corpus-sized) registry every batch.

Built for streaming/funnel.py's fingerprint registry (ROADMAP round-4
#3), but generic: any append-only key set whose membership gates a
batch (seen-URL sets, processed-file ledgers, replay guards) fits.

Execution split — who computes what:

- **Hashing stays JVM-side.** The k probe positions are Spark column
  expressions over ``xxhash64`` (Kirsch–Mitzenmacher double hashing:
  ``pos_i = (h1 + i*h2) mod m`` from two independently-seeded base
  hashes). Build and probe use the SAME expressions, so there is no
  Python reimplementation of xxhash to drift out of sync, and the
  positions are inside whole-stage codegen.
- **Only the bitmap probe crosses to Python** — an Arrow-vectorized
  pandas UDF that indexes a numpy bitmap (broadcast once per
  executor via ``SparkContext.broadcast``). Per batch of 10k rows
  that is one vectorized gather, not 10k lambda calls.
- **Updates are O(batch), never O(set).** ``positions_of`` on the new
  keys → explode → distinct → collect (bounded by batch_rows × k) →
  OR into the bitmap driver-side. Bootstrap over an existing large
  set aggregates per-partition bitmaps executor-side (``mapInPandas``
  emitting one m/8-byte payload per partition) and ORs them on the
  driver: one pass, no per-row collect.

Sizing: classic ``m = -n ln(p) / ln(2)^2``, ``k = (m/n) ln 2``. A
2M-key registry at 1% fpp is ~2.4 MB of bitmap — broadcastable. False
positives only cost a wasted registry-join probe (the join then finds
nothing); false NEGATIVES are impossible as long as every committed
key was added, which the tx-log manifest guarantees by referencing
the bloom sidecar in the same atomic commit (streaming/funnel.py).

Overflow posture: all position arithmetic is pre-reduced mod m
(``pmod`` before the multiply), so it stays far below 2^63 and is
ANSI-mode safe.
"""

from __future__ import annotations

import math
import os
import struct
from dataclasses import dataclass

import numpy as np
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_MAGIC = b"BLM1"
# xxhash64 seeds for the two base hashes. Spark's xxhash64(col) uses
# seed 42; passing an extra literal column changes the hash chain, so
# (col), (col, 1) give two independent 64-bit streams.
_SEED_TAG = 1


def bloom_params(capacity: int, fpp: float = 0.01) -> tuple[int, int]:
    """(m_bits, k) for ``capacity`` keys at ``fpp`` false-positive
    rate. m is rounded up to a multiple of 64; k clamped to [1, 16]."""
    capacity = max(1, capacity)
    m = int(math.ceil(-capacity * math.log(fpp) / (math.log(2) ** 2)))
    m = ((m + 63) // 64) * 64
    k = max(1, min(16, round(m / capacity * math.log(2))))
    return m, k


@dataclass
class Bloom:
    """Bitmap + parameters. ``bits`` is a uint8 array of m/8 bytes."""

    m_bits: int
    k: int
    bits: np.ndarray

    @classmethod
    def empty(cls, capacity: int, fpp: float = 0.01) -> "Bloom":
        m, k = bloom_params(capacity, fpp)
        return cls(m, k, np.zeros(m // 8, dtype=np.uint8))

    # ---- serialization (sidecar file format) ----------------------------

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<qq", self.m_bits, self.k) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Bloom":
        if raw[:4] != _MAGIC:
            raise ValueError("not a bloom sidecar")
        m, k = struct.unpack("<qq", raw[4:20])
        bits = np.frombuffer(raw[20:], dtype=np.uint8).copy()
        if bits.size != m // 8:
            raise ValueError("bloom sidecar truncated")
        return cls(m, k, bits)

    def save(self, path: str) -> None:
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(self.to_bytes())
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)

    @classmethod
    def load(cls, path: str) -> "Bloom":
        with open(path, "rb") as f:
            return cls.from_bytes(f.read())

    # ---- driver-side updates -------------------------------------------

    def add_positions(self, positions) -> None:
        if not isinstance(positions, np.ndarray):
            positions = list(positions)
        pos = np.asarray(positions, dtype=np.int64)
        if pos.size:
            np.bitwise_or.at(self.bits, pos // 8, (1 << (pos % 8)).astype(np.uint8))

    def or_bytes(self, other_bits: bytes) -> None:
        arr = np.frombuffer(other_bits, dtype=np.uint8)
        if arr.size != self.bits.size:
            raise ValueError("bitmap size mismatch")
        np.bitwise_or(self.bits, arr, out=self.bits)


def positions_of(col: Column, m_bits: int, k: int) -> Column:
    """``array<long>`` of the k probe positions for ``col`` — the one
    hashing definition shared by build and probe."""
    h1 = F.pmod(F.xxhash64(col), F.lit(m_bits))
    # force a distinct second stream; (2*h2'+1) keeps the stride odd
    # so probe sequences don't collapse when m is a power of two
    h2 = F.pmod(
        F.pmod(F.xxhash64(col, F.lit(_SEED_TAG)), F.lit(m_bits)) * 2 + 1,
        F.lit(m_bits),
    )
    return F.array(
        *[F.pmod(h1 + F.lit(i) * h2, F.lit(m_bits)) for i in range(k)]
    )


def update_bloom(df: DataFrame, col: str, bloom: Bloom) -> int:
    """OR ``df[col]``'s keys into ``bloom`` (mutates it). Each
    partition emits whichever encoding of its contribution is
    smaller — a sparse int64 position array (small batches) or the
    dense m/8-byte bitmap (position count crossed bitmap size) — so
    the driver collect is bounded by ``partitions × m/8`` bytes no
    matter how large the batch, and far smaller for typical
    micro-batches. Returns the number of partition payloads merged."""
    m, k = bloom.m_bits, bloom.k
    nbytes = m // 8

    def fold(batches):
        import pandas as pd

        pos_chunks: list[np.ndarray] = []
        n_pos = 0
        dense: np.ndarray | None = None
        for pdf in batches:
            for arr in pdf["pos"]:
                p = np.asarray(arr, dtype=np.int64)
                if dense is None:
                    pos_chunks.append(p)
                    n_pos += p.size
                    if n_pos * 8 > nbytes:  # sparse got bigger than dense
                        dense = np.zeros(nbytes, dtype=np.uint8)
                        for q in pos_chunks:
                            np.bitwise_or.at(
                                dense, q // 8, (1 << (q % 8)).astype(np.uint8)
                            )
                        pos_chunks = []
                else:
                    np.bitwise_or.at(
                        dense, p // 8, (1 << (p % 8)).astype(np.uint8)
                    )
        if dense is not None:
            yield pd.DataFrame({"payload": [dense.tobytes()], "dense": [True]})
        elif pos_chunks:
            yield pd.DataFrame(
                {
                    "payload": [np.concatenate(pos_chunks).tobytes()],
                    "dense": [False],
                }
            )

    payloads = (
        df.select(positions_of(F.col(col), m, k).alias("pos"))
        .mapInPandas(fold, "payload binary, dense boolean")
        .collect()
    )
    for r in payloads:
        if r["dense"]:
            bloom.or_bytes(r["payload"])
        else:
            bloom.add_positions(np.frombuffer(r["payload"], dtype=np.int64))
    return len(payloads)


def bloom_from_df(
    df: DataFrame, col: str, capacity: int, fpp: float = 0.01
) -> Bloom:
    """Bootstrap a bloom over an existing (possibly large) key set:
    each partition folds its keys into a local bitmap and emits the
    m/8 bytes once; the driver ORs the per-partition payloads. One
    pass over the data, collect size = partitions × m/8."""
    bloom = Bloom.empty(capacity, fpp)
    m, k = bloom.m_bits, bloom.k
    nbytes = m // 8

    def fold(batches):
        import pandas as pd

        local = np.zeros(nbytes, dtype=np.uint8)
        seen = False
        for pdf in batches:
            for arr in pdf["pos"]:
                p = np.asarray(arr, dtype=np.int64)
                np.bitwise_or.at(local, p // 8, (1 << (p % 8)).astype(np.uint8))
                seen = True
        if seen:
            yield pd.DataFrame({"bits": [local.tobytes()]})

    payloads = (
        df.select(positions_of(F.col(col), m, k).alias("pos"))
        .mapInPandas(fold, "bits binary")
        .collect()
    )
    for r in payloads:
        bloom.or_bytes(r["bits"])
    return bloom


def with_might_contain(
    spark: SparkSession,
    df: DataFrame,
    col: str,
    bloom: Bloom,
    out_col: str = "_maybe",
) -> DataFrame:
    """Add a boolean column: False ⇒ key definitely NOT in the bloom's
    set; True ⇒ maybe present (probe the real registry). The bitmap
    ships once per executor as a Spark broadcast; the probe is a
    vectorized numpy gather per Arrow batch."""
    from pyspark.sql import functions as F2

    bc = spark.sparkContext.broadcast(bloom.bits.tobytes())

    @F2.pandas_udf("boolean")
    def probe(pos_s):
        import pandas as pd

        if len(pos_s) == 0:
            return pd.Series([], dtype=bool)
        bits = np.frombuffer(bc.value, dtype=np.uint8)
        # every row has exactly k positions → one (n, k) gather
        mat = np.vstack([np.asarray(a, dtype=np.int64) for a in pos_s])
        hit = (bits[mat // 8] >> (mat % 8)) & 1
        return pd.Series(hit.all(axis=1))

    return df.withColumn(
        out_col, probe(positions_of(F.col(col), bloom.m_bits, bloom.k))
    )
