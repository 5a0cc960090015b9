"""BPE training + distributed application: the Sennrich greedy
procedure's invariants, an independent hand-worked example, and the
Spark apply matching the driver-side encoder exactly."""

from __future__ import annotations

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
