"""chunk_documents invariants: full token coverage, stride layout,
and exact reconstruction of the original text from the chunks."""

from __future__ import annotations

import math

from nfl_data_pipeline_spark.operators.text import chunk_documents


def _run(spark, texts, window, stride):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    rows = chunk_documents(df, window=window, stride=stride).collect()
    by_doc: dict[int, list] = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    for chunks in by_doc.values():
        chunks.sort(key=lambda r: r["chunk_idx"])
    return by_doc


def test_layout_and_reconstruction(spark):
    texts = [
        "one",  # single short doc
        " ".join(f"t{i}" for i in range(100)),  # many chunks
        " ".join(f"t{i}" for i in range(32)),  # exactly one window
        " ".join(f"t{i}" for i in range(33)),  # one token past a window
        "",  # empty text → one ['']-token chunk
    ]
    window, stride = 32, 24
    by_doc = _run(spark, texts, window, stride)
    for doc_id, text in enumerate(texts):
        toks = text.split(" ")
        n = len(toks)
        chunks = by_doc[doc_id]
        # chunk count and dense 0-based indexing
        assert len(chunks) == math.floor((n - 1) / stride) + 1
        assert [c["chunk_idx"] for c in chunks] == list(range(len(chunks)))
        for c in chunks:
            s = c["chunk_start"]
            assert s == c["chunk_idx"] * stride
            assert c["chunk_tokens"] == min(window, n - s)
            assert c["chunk_text"] == " ".join(toks[s : s + window])
        # every token covered; stitching strides reconstructs the text
        stitched = []
        for c in chunks:
            stitched.extend(c["chunk_text"].split(" ")[:stride])
        assert stitched[:n] == toks


def test_no_overlap_when_stride_equals_window(spark):
    by_doc = _run(spark, [" ".join("abcdefghij")], window=3, stride=3)
    chunks = by_doc[0]
    assert "".join(" ".join(c["chunk_text"] for c in chunks).split(" ")) == (
        "abcdefghij"
    )
    assert all(c["chunk_tokens"] == 3 for c in chunks[:-1])
