"""Streaming sequence packing: the concat-and-chunk packer
(queries/llmprep.sequence_packing) as a custom stateful operator over
a documents stream.

The batch packer assigns each document to the 256-token chunk its
first token lands in, via a per-shard running token sum. Streaming
needs that running sum to SURVIVE micro-batches — exactly the
arbitrary-state shape ``applyInPandasWithState`` exists for: state is
one integer (cumulative tokens emitted so far) per shard.

Ordering contract: the packer is order-sensitive by definition (so is
the batch one — it packs in doc_id order). Within a micro-batch rows
are sorted by doc_id; ACROSS batches the file source must deliver
shards in doc_id order (an ordered ingest manifest / monotone file
naming — the normal shape of tokenizer-feed pipelines). Out-of-order
arrival shifts bin boundaries exactly as it would shift tokens in the
emitted training sequences.

State size: one (long,) per shard — bounded by shard cardinality,
irrelevant at any corpus size.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

PACK_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType()),
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("bin_id", T.LongType()),
    ]
)

PACK_STATE_SCHEMA = T.StructType([T.StructField("cum_tokens", T.LongType())])


def _make_packer(budget: int):
    def _pack(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterable[pd.DataFrame]:
        (source,) = key
        (cum,) = state.get if state.exists else (0,)
        # applyInPandasWithState delivers a group's micro-batch as
        # MULTIPLE Arrow chunks (~10k rows each, and upstream shuffle
        # partitions interleave) — sorting each chunk independently
        # would only be chunk-local order, silently diverging from the
        # batch twin once a shard exceeds one chunk. Concatenate the
        # whole micro-batch, sort once, then run the cumulative sum.
        # Memory note: this bounds per-group working set at micro-batch
        # size (tune maxFilesPerTrigger), which the running-sum
        # semantics require anyway — a global order can't be computed
        # on chunks we haven't seen.
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if len(pdf):
            pdf = pdf.sort_values("doc_id")
            n_tokens = pdf["text"].str.split(" ").str.len().astype("int64")
            starts = cum + n_tokens.cumsum() - n_tokens
            cum = int(cum + n_tokens.sum())
            yield pd.DataFrame(
                {
                    "source": source,
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_tokens": n_tokens.to_numpy(),
                    "bin_id": (starts // budget).to_numpy(),
                }
            )
        state.update((cum,))

    return _pack


def pack_stream(docs: DataFrame, budget: int = 256) -> DataFrame:
    """Per-shard streaming packer: emits (source, doc_id, n_tokens,
    bin_id) for every arriving document, with the running token sum
    held as explicit state so bin boundaries are continuous across
    micro-batches — identical to the batch packer's assignment when
    documents arrive in doc_id order (asserted by the batch-twin test
    in tests/test_streaming.py)."""
    return docs.groupBy("source").applyInPandasWithState(
        _make_packer(budget),
        outputStructType=PACK_OUTPUT_SCHEMA,
        stateStructType=PACK_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
