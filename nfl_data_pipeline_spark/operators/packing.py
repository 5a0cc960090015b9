"""Cross-shard packing rebalance: the second pass over
``sequence_packing``'s per-shard bins (ROADMAP #4).

Concat-and-chunk packs each shard (``source``) independently — the
right first pass at 100 TB (no cross-shard coordination) — but it
strands up to one underfull tail bin per shard, and first-token
assignment lets interior bins drift below budget too. If training
wants uniform sequences, those tail bins waste padding. This operator
merges underfull bins ACROSS shards into full groups.

Scale shape: the input here is BIN SUMMARIES, not documents — one row
per underfull bin, cardinality O(#shards + drift), thousands of rows
for a corpus with thousands of shards while the documents stay
distributed. Both strategies below funnel only this tiny summary
relation through a narrow point, the same broadcast-small-side
contract as the PQ query path (operators/similarity.py):

- ``strategy="ffd"`` — exact first-fit-decreasing in ONE pandas group
  (single-partition applyInPandas over the summaries). Guarantees
  every merged group ≤ budget. O(U²) worst case in underfull-bin
  count U; fine to ~100k bins, and U is shard-bounded by
  construction.
- ``strategy="chunk"`` — sort by tokens descending, running-sum,
  ``floor(cum_prev / budget)``: the concat-and-chunk trick one level
  up, pure window SQL (this is the variant the DuckDB oracle
  hash-gates as the ``pack_rebalance`` query). A group can overflow
  by at most one bin, i.e. ``< budget * (1 + fill_threshold)`` total;
  in exchange it needs no sequential pass at all.

Reference: beyond the reference repo (its pipeline stops at analytic
tables); the pass itself is the standard bin-packing cleanup stage of
tokenizer sharding jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def underfull_bins(
    bins: DataFrame, budget: int, fill_threshold: float = 0.85
) -> DataFrame:
    """Bins whose token fill is below ``fill_threshold * budget``.
    Expects columns (source, bin_id, bin_tokens)."""
    return bins.filter(F.col("bin_tokens") < int(budget * fill_threshold))


def _chunk_merge(under: DataFrame, budget: int) -> DataFrame:
    """Window-chunk merge: deterministic global order (tokens desc,
    then source/bin_id), running sum, first-token group assignment.
    The single-partition window sees only bin summaries (see module
    docstring for the cardinality argument)."""
    w = Window.orderBy(
        F.col("bin_tokens").desc(), F.col("source"), F.col("bin_id")
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = F.sum("bin_tokens").over(w)
    out = under.select("source", "bin_id", "bin_tokens").withColumn(
        "merged_bin",
        F.floor((cum - F.col("bin_tokens")) / F.lit(budget)).cast("long"),
    )
    wg = Window.partitionBy("merged_bin")
    return out.withColumn(
        "merged_tokens", F.sum("bin_tokens").over(wg).cast("long")
    )


def _ffd_merge(under: DataFrame, budget: int) -> DataFrame:
    """Exact first-fit-decreasing over the bin summaries in one pandas
    group: every merged group is ≤ budget, strictly."""
    import pandas as pd

    def ffd(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["bin_tokens", "source", "bin_id"],
            ascending=[False, True, True],
            kind="mergesort",  # stable → deterministic output
        )
        residual: list[int] = []  # open group → remaining capacity
        assign: list[int] = []
        for tok in pdf["bin_tokens"]:
            tok = int(tok)
            for gi in range(len(residual)):
                if tok <= residual[gi]:
                    residual[gi] -= tok
                    assign.append(gi)
                    break
            else:
                residual.append(budget - tok)
                assign.append(len(residual) - 1)
        pdf = pdf.assign(merged_bin=assign)
        totals = pdf.groupby("merged_bin")["bin_tokens"].transform("sum")
        return pdf.assign(merged_tokens=totals)[
            ["source", "bin_id", "bin_tokens", "merged_bin", "merged_tokens"]
        ]

    sel = under.select(
        "source", "bin_id", F.col("bin_tokens").cast("long").alias("bin_tokens")
    )
    return (
        sel.groupBy(F.lit(0).alias("_g"))
        .applyInPandas(
            ffd,
            "source string, bin_id long, bin_tokens long, "
            "merged_bin long, merged_tokens long",
        )
    )


def rebalance_tail_bins(
    bins: DataFrame,
    budget: int,
    fill_threshold: float = 0.85,
    strategy: str = "ffd",
) -> DataFrame:
    """Merge cross-shard underfull bins into near-full groups.

    Input: bin summaries (source, bin_id, bin_tokens, ...). Output:
    one row per underfull bin with its ``merged_bin`` assignment and
    the group's ``merged_tokens`` total. Full bins are untouched by
    contract — re-packing them would reshuffle already-good training
    sequences for no fill gain.
    """
    under = underfull_bins(bins, budget, fill_threshold)
    if strategy == "ffd":
        return _ffd_merge(under, budget)
    if strategy == "chunk":
        return _chunk_merge(under, budget)
    raise ValueError(f"unknown strategy: {strategy!r}")
