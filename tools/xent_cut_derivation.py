"""Derive the pinned perplexity-gate cut constants from the fixture
corpus (r11 VERDICT What's-wrong #3: `_BIGRAM_XENT_CUT = 3.44` was a
fixture percentile pinned without a recorded derivation run).

Prints the observed cross-entropy percentile ladder for BOTH LM
gates next to the pinned constants, so each number regenerates from
one command:

    python tools/xent_cut_derivation.py                # sf0.001
    python tools/xent_cut_derivation.py /root/testdata/sf0.01

The cuts are deliberately pinned CONSTANTS, not per-run percentiles:
the funnel's gate verdicts must be replay-stable across batches and
rounds, and a data-derived threshold would drift with every batch
mix (the single-definition rule in queries/llmprep.py). This tool is
the provenance record, not a config generator — if the fixture
corpus is ever regenerated, re-run it and re-pin consciously.
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from nfl_data_pipeline_spark.queries.llmprep import (  # noqa: E402
    _BIGRAM_XENT_CUT,
    _XENT_CUT,
    bigram_logprob,
    unigram_logprob,
)
from nfl_data_pipeline_spark.session import get_spark  # noqa: E402

PROBS = [0.50, 0.90, 0.95, 0.97, 0.99, 1.0]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="xent-cut-derivation")
    spark.sparkContext.setLogLevel("ERROR")
    for name, fn, cut in (
        ("unigram", unigram_logprob, _XENT_CUT),
        ("bigram", bigram_logprob, _BIGRAM_XENT_CUT),
    ):
        xs = sorted(
            r["xent_nats"] for r in fn(spark, sf_dir).collect()
        )
        n = len(xs)
        ladder = {
            f"p{int(p * 100)}": round(xs[min(n - 1, int(p * (n - 1)))], 4)
            for p in PROBS
        }
        below = sum(1 for x in xs if x <= cut) / n
        print(
            f"{name}: n={n} min={xs[0]:.4f} {ladder} "
            f"pinned_cut={cut} (≤cut: {below:.1%})"
        )
    spark.stop()


if __name__ == "__main__":
    main()
