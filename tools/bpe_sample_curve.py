"""BPE sample-training contract (judge r6 item 8): how much sample
does the driver-side trainer need before its tokenization agrees with
FULL-corpus training at the 10x tier?

For each sample size, train driver-side on the first-N docs (doc_id
order — deterministic), then compare against the exact full-corpus
trainer (operators/bpe.train_bpe_distributed — distributed word
count, identical merge loop). Agreement is measured per UNIQUE word,
weighted by corpus frequency: the fraction of word occurrences whose
token sequence is identical under both merge tables (encoder-equality
of the merges themselves pins the distributed trainer; this curve
pins the SAMPLING).

Usage: python tools/bpe_sample_curve.py [TIER_DIR] [N_MERGES]
Prints one JSON line; recorded in SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.catalog import load
from nfl_data_pipeline_spark.operators.bpe import (
    _WS_RE,
    bpe_encode_word,
    train_bpe,
    train_bpe_distributed,
)
from nfl_data_pipeline_spark.session import get_spark

SIZES = [25, 50, 100, 200, 400, 800]


def _synthetic_docs(spark, n_docs: int = 50_000, words_per_doc: int = 60):
    """Zipf corpus over a generated 5k-pseudo-word vocabulary with
    REAL subword structure (syllable-composed words) — the fixture
    documents have only ~31 unique words, which makes every sample
    size agree trivially; the sampling question needs vocabulary the
    sample can MISS."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(7)
    syll = [
        c + v
        for c in "bcdfghjklmnprstvz"
        for v in ("a", "e", "i", "o", "u")
    ]
    vocab = np.array(
        [
            "".join(rng.choice(syll, size=rng.integers(2, 6)))
            for _ in range(5_000)
        ]
    )
    # zipf ranks: P(rank r) ∝ 1/r^1.1, capped to the vocab
    ranks = rng.zipf(1.1, size=n_docs * words_per_doc)
    ranks = (ranks - 1) % len(vocab)
    words = vocab[ranks].reshape(n_docs, words_per_doc)
    pdf = pd.DataFrame(
        {
            "doc_id": np.arange(n_docs, dtype="int64"),
            "text": [" ".join(w) for w in words],
        }
    )
    return spark.createDataFrame(pdf).repartition(32)


def main(tier_dir: str, n_merges: int) -> dict:
    spark = get_spark(app_name="bpe-sample-curve")
    spark.sparkContext.setLogLevel("ERROR")
    if tier_dir == "synthetic":
        docs = (
            _synthetic_docs(spark)
            .localCheckpoint(eager=True)
        )
    else:
        docs = load(spark, tier_dir, "documents")
    n_docs = docs.count()

    t0 = time.perf_counter()
    full = train_bpe_distributed(docs, "text", n_merges=n_merges)
    full_wall = round(time.perf_counter() - t0, 2)
    full_ranks = {p: i for i, p in enumerate(full)}

    # unique words + corpus frequency (the agreement weights) —
    # split with the trainers' own Unicode-whitespace rule (_WS_RE),
    # not ASCII \s+: on scraped text with NBSP the tool would
    # otherwise weigh welded pseudo-words neither trainer ever saw
    wc = (
        docs.select(F.explode(F.split("text", _WS_RE)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    total = sum(int(r["count"]) for r in wc)
    full_enc = {r["w"]: bpe_encode_word(r["w"], full_ranks) for r in wc}

    curve = []
    for n in SIZES:
        sample = [
            r["text"]
            for r in docs.orderBy("doc_id").limit(n).select("text").collect()
        ]
        t0 = time.perf_counter()
        merges = train_bpe(sample, n_merges=n_merges)
        wall = round(time.perf_counter() - t0, 2)
        ranks = {p: i for i, p in enumerate(merges)}
        agree = sum(
            int(r["count"])
            for r in wc
            if bpe_encode_word(r["w"], ranks) == full_enc[r["w"]]
        )
        shared = len(set(merges) & set(full))
        curve.append(
            {
                "sample_docs": n,
                "train_wall_s": wall,
                "merge_overlap": shared / max(1, len(full)),
                "token_agreement": round(agree / total, 4),
            }
        )
    out = {
        "tier_dir": tier_dir,
        "n_docs": n_docs,
        "n_unique_words": len(wc),
        "n_merges": n_merges,
        "full_train_wall_s": full_wall,
        "curve": curve,
    }
    spark.stop()
    return out


if __name__ == "__main__":
    tier = sys.argv[1] if len(sys.argv) > 1 else "/tmp/sfbig"
    nm = int(sys.argv[2]) if len(sys.argv) > 2 else 200
    print(json.dumps(main(tier, nm)))
