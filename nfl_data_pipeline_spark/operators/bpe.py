"""Byte-pair-encoding tokenization — the real subword step between
the curation suite and "tokenizer input" (the BPE-ish regex in
text_doc_profile counts pre-tokens; this module actually merges).

Production shape, mirrored here: the merge table is TRAINED on a
bounded SAMPLE driver-side (tokenizer training is a sequential
greedy loop over pair counts — a few MB of text decides a vocabulary
for 100 TB, which is exactly how real tokenizers are built), then
APPLIED distributed as an Arrow-batched pandas UDF carrying only the
merge list as closure data. Training is the classic Sennrich et al.
(2016) procedure: start from characters + an end-of-word marker,
repeatedly merge the most frequent adjacent symbol pair (frequency
ties break to the lexicographically GREATEST pair — any fixed rule
works, this one is explicit), record the merge order;
application replays merges by rank — greedy lowest-rank-first, the
same replay real BPE tokenizers use.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_EOW = "</w>"

# Java charclass equal to Python's str.split() whitespace set
# (str.isspace()), verified EXHAUSTIVELY over every Unicode codepoint
# (no astral-plane whitespace exists). Java \s alone is ASCII-only —
# an NBSP (U+00A0, ubiquitous in scraped HTML) would weld two words
# together on the JVM side while the driver trainer splits them,
# breaking the pinned trainer-equality contract.
_WS_RE = (
    "[\\s\\u001c-\\u001f\\u0085\\u00a0\\u1680\\u2000-\\u200a"
    "\\u2028\\u2029\\u202f\\u205f\\u3000]+"
)


def train_bpe(
    texts: list[str], n_merges: int = 200
) -> list[tuple[str, str]]:
    """Learn an ordered merge table from sample texts. Deterministic:
    ties on pair frequency break lexicographically."""
    vocab: Counter[tuple[str, ...]] = Counter()
    for t in texts:
        for w in t.split():
            vocab[(*w, _EOW)] += 1
    return _train_from_vocab(vocab, n_merges)


def train_bpe_distributed(
    df: DataFrame, text_col: str = "text", n_merges: int = 200
) -> list[tuple[str, str]]:
    """FULL-CORPUS BPE training without sampling: the corpus pass is
    one distributed word-frequency aggregation (explode → groupBy →
    count, map-side combined), and only the UNIQUE-WORD frequency
    table comes back to the driver — which is all Sennrich-2016
    training ever consumes, so this is exact, not approximate. The
    sequential merge loop then costs O(unique words · merges),
    independent of corpus row count. Driver memory is bounded by the
    vocabulary, not the corpus (natural-language vocabularies grow
    ~sub-linearly / Heaps' law; for a pathological open vocabulary
    cap it upstream with a frequency floor). Encoder-equality with
    ``train_bpe`` on the same corpus is pinned by
    tests/test_bpe.py::test_distributed_trainer_equals_driver."""
    counts = (
        # _WS_RE split + empty filter == Python str.split()
        # (train_bpe's rule) — the two trainers must see identical
        # words on any Unicode text, not just ASCII
        df.select(
            F.explode(F.split(F.col(text_col), _WS_RE)).alias("w")
        )
        .filter(F.col("w") != "")
        .groupBy("w")
        .count()
        .collect()
    )
    vocab: Counter[tuple[str, ...]] = Counter()
    for r in counts:
        vocab[(*r["w"], _EOW)] += int(r["count"])
    return _train_from_vocab(vocab, n_merges)


def _train_from_vocab(
    vocab: Counter, n_merges: int
) -> list[tuple[str, str]]:
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, c in vocab.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append(best)
        merged_tok = best[0] + best[1]
        new_vocab: Counter[tuple[str, ...]] = Counter()
        for sym, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(sym):
                if (
                    i + 1 < len(sym)
                    and sym[i] == best[0]
                    and sym[i + 1] == best[1]
                ):
                    out.append(merged_tok)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            new_vocab[tuple(out)] += c
        vocab = new_vocab
    return merges


def bpe_encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Apply a trained merge table to one word: repeatedly merge the
    LOWEST-RANK adjacent pair present — the standard greedy replay."""
    sym: list[str] = [*word, _EOW]
    while len(sym) > 1:
        best_rank = None
        best_i = -1
        for i, pair in enumerate(zip(sym, sym[1:])):
            r = ranks.get(pair)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_i = r, i
        if best_rank is None:
            break
        sym[best_i : best_i + 2] = [sym[best_i] + sym[best_i + 1]]
    return sym


def bpe_tokens(
    merges: list[tuple[str, str]], text_col: str = "text"
) -> Column:
    """Column of BPE tokens for a whitespace-split text column —
    Arrow-batched; the merge table travels as closure data (a few KB
    for any real vocabulary), never a join."""
    import pandas as pd
    from pyspark.sql import types as T

    ranks = {pair: i for i, pair in enumerate(merges)}

    # no type hints: under `from __future__ import annotations` the
    # string hints can't be resolved by pandas_udf's inspector when
    # pandas is imported function-locally (same as ol_projection)
    @F.pandas_udf(T.ArrayType(T.StringType()))
    def _encode(texts):
        cache: dict[str, list[str]] = {}

        def enc(t):
            out: list[str] = []
            for w in t.split():
                got = cache.get(w)
                if got is None:
                    got = bpe_encode_word(w, ranks)
                    cache[w] = got
                out.extend(got)
            return out

        return texts.map(enc)

    return _encode(F.col(text_col))


def with_bpe_tokens(
    df: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
) -> DataFrame:
    """Attach BPE tokens + their count — the tokenizer-input columns
    a packing/budgeting stage consumes."""
    out = df.withColumn(out_col, bpe_tokens(merges, text_col))
    return out.withColumn(f"n_{out_col}", F.size(out_col))
