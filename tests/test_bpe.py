"""BPE training + distributed application: the Sennrich greedy
procedure's invariants, an independent hand-worked example, and the
Spark apply matching the driver-side encoder exactly."""

from __future__ import annotations

from pyspark.sql import functions as F

from nfl_data_pipeline_spark.operators.bpe import (
    _EOW,
    bpe_encode_word,
    train_bpe,
    with_bpe_tokens,
)


def test_train_merges_hand_worked():
    # classic toy corpus: 'low' ×5, 'lowest' ×2 — first merges must
    # assemble the shared stem greedily by pair frequency
    texts = ["low low low low low", "lowest lowest"]
    merges = train_bpe(texts, n_merges=4)
    # ('l','o') and ('o','w') tie at 7; the documented tie-break takes
    # the lexicographically greatest, then the stem assembles
    assert merges[0] == ("o", "w")
    assert merges[1] == ("l", "ow")
    ranks = {p: i for i, p in enumerate(merges)}
    # after 4 merges the frequent word is a single token
    assert bpe_encode_word("low", ranks) == ["low" + _EOW]


def test_encode_replays_by_rank_not_position():
    # rank order must win over left-to-right position
    merges = [("b", "c"), ("a", "bc")]
    ranks = {p: i for i, p in enumerate(merges)}
    assert bpe_encode_word("abc", ranks) == ["abc", _EOW]


def test_roundtrip_and_oov():
    texts = ["the quick brown fox jumps over the lazy dog"] * 3
    merges = train_bpe(texts, n_merges=50)
    ranks = {p: i for i, p in enumerate(merges)}
    for w in ["the", "quick", "zzzunseen"]:
        toks = bpe_encode_word(w, ranks)
        # lossless: concatenating tokens reconstructs word + marker
        assert "".join(toks) == w + _EOW
        assert all(t for t in toks)


def test_spark_apply_matches_driver_encoder(spark):
    texts = [
        "pack the packs packed packer",
        "unpack the packing",
        "repack a packet",
    ]
    merges = train_bpe(texts, n_merges=30)
    ranks = {p: i for i, p in enumerate(merges)}
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    rows = {r["id"]: r for r in with_bpe_tokens(df, merges).collect()}
    for i, t in enumerate(texts):
        want = [tok for w in t.split() for tok in bpe_encode_word(w, ranks)]
        assert list(rows[i]["bpe_tokens"]) == want
        assert rows[i]["n_bpe_tokens"] == len(want)


def test_bpe_composes_with_sequence_packing(spark):
    """Tokenizer-input composition: pack documents into token-budget
    bins by their REAL BPE token counts (the concat-and-chunk rule
    over n_bpe_tokens instead of the whitespace count), recomputed in
    plain Python."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from nfl_data_pipeline_spark.catalog import load
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents").select(
        "doc_id", "source", "text"
    ).limit(200)
    sample = [r["text"] for r in docs.limit(40).collect()]
    merges = train_bpe(sample, n_merges=60)
    budget = 512
    toks = with_bpe_tokens(docs, merges)
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = toks.withColumn(
        "cum", F.sum("n_bpe_tokens").over(w)
    ).withColumn(
        "bin_id",
        F.floor((F.col("cum") - F.col("n_bpe_tokens")) / budget),
    )
    rows = packed.select(
        "doc_id", "source", "n_bpe_tokens", "bin_id"
    ).collect()
    # python recompute of the assignment rule per shard
    by_src: dict[str, list] = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["doc_id"])):
        by_src.setdefault(r["source"], []).append(r)
    for src, rs in by_src.items():
        cum = 0
        for r in rs:
            assert r["bin_id"] == cum // budget, (src, r["doc_id"])
            cum += r["n_bpe_tokens"]


def test_distributed_trainer_equals_driver(spark):
    """train_bpe_distributed must learn the IDENTICAL ordered merge
    table as driver-side train_bpe on the same corpus — the trainer
    only ever consumes word frequencies, so distributing the word
    count changes nothing."""
    from nfl_data_pipeline_spark.catalog import load
    from nfl_data_pipeline_spark.operators.bpe import (
        train_bpe,
        train_bpe_distributed,
        with_bpe_tokens,
    )
    from tests.conftest import SF_SMOKE

    docs = load(spark, SF_SMOKE, "documents")
    texts = [r["text"] for r in docs.select("text").collect()]
    driver_merges = train_bpe(texts, n_merges=120)
    dist_merges = train_bpe_distributed(docs, "text", n_merges=120)
    assert dist_merges == driver_merges

    # and the encoder output is therefore identical too
    a = with_bpe_tokens(docs, driver_merges).select(
        "doc_id", "bpe_tokens"
    )
    b = with_bpe_tokens(docs, dist_merges).select(
        "doc_id", F.col("bpe_tokens").alias("bt2")
    )
    j = a.join(b, "doc_id")
    assert j.filter(F.col("bpe_tokens") != F.col("bt2")).count() == 0


def test_distributed_trainer_unicode_whitespace_parity(spark):
    """Code-review r7: Java \\s is ASCII-only while Python str.split()
    splits all Unicode whitespace --- on scraped-HTML text with NBSP /
    line-separator / file-separator chars the two trainers must still
    see identical words (the split charclass was verified exhaustively
    over every Unicode codepoint; this pins the nastiest cases)."""
    from nfl_data_pipeline_spark.operators.bpe import (
        train_bpe,
        train_bpe_distributed,
    )

    texts = [
        "foo\u00a0bar foo bar",              # NBSP between words
        "alpha\u2028beta\u3000gamma",        # line sep + ideographic space
        "xy\u001cz\u2009x",                  # file sep + thin space
        "plain ascii words here",
    ]
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    assert train_bpe_distributed(df, "text", n_merges=40) == train_bpe(
        texts, n_merges=40
    )
