"""GIF codec (operators/gif.py): LZW roundtrips, exact-palette and
quantized encodes, animation with disposal/transparency/interlace,
and the multimodal integration — frame_sample's REAL multi-frame path
is driven by an animated GIF."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from nfl_data_pipeline_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_gif_frames,
    encode_gif,
)
from nfl_data_pipeline_spark.operators.multimodal import (
    decode_media,
    image_rgb,
    phash_image,
    resize_gif,
)


def _flag(seed=0):
    img = np.zeros((10, 14, 3), np.uint8)
    img[:5] = [255, 0, 0]
    img[5:, :7] = [0, 255, 0]
    img[5:, 7:] = [0, 0, 255]
    return img


@pytest.mark.parametrize("mcs", [2, 4, 8])
def test_lzw_roundtrip(mcs):
    rng = np.random.default_rng(mcs)
    idx = list(rng.integers(0, 1 << mcs, size=4000))
    assert _lzw_decode(mcs, _lzw_encode(mcs, idx)) == idx


def test_exact_palette_roundtrip():
    img = _flag()
    payload = encode_gif([img.tobytes()], 14, 10)
    frames, w, h = decode_gif_frames(payload)
    assert (w, h, len(frames)) == (14, 10, 1)
    out = np.frombuffer(frames[0][1], np.uint8).reshape(10, 14, 3)
    assert (out == img).all()


def test_quantized_fallback_bounded_error():
    rng = np.random.default_rng(2)
    big = rng.integers(0, 256, size=(32, 48, 3), dtype=np.uint8)
    frames, _, _ = decode_gif_frames(encode_gif([big.tobytes()], 48, 32))
    out = np.frombuffer(frames[0][1], np.uint8).reshape(32, 48, 3)
    # uniform 6x7x6 cells are at most 51 wide
    assert np.abs(out.astype(int) - big.astype(int)).max() <= 52


def test_animation_delays_and_frames():
    base = _flag()
    f2 = np.full_like(base, [0, 0, 255])
    f3 = np.full_like(base, [255, 255, 0])
    payload = encode_gif(
        [base.tobytes(), f2.tobytes(), f3.tobytes()], 14, 10, [40, 80, 120]
    )
    frames, w, h = decode_gif_frames(payload)
    assert [d for d, _ in frames] == [40, 80, 120]
    assert (
        np.frombuffer(frames[2][1], np.uint8).reshape(10, 14, 3)
        == f3
    ).all()


def test_transparency_and_disposal_keep():
    # handcraft: frame 1 full red; frame 2 a 2x2 patch at (1,1) with
    # a transparent index — untouched canvas pixels must persist
    red, green = b"\xff\x00\x00", b"\x00\xff\x00"
    table = red + green + bytes(6)  # 4 entries
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 4, 4, 0x81, 0, 0)  # GCT, 4 entries
    out += table
    # frame 1: all index 0 (red), no GCE
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 4, 4, 0)
    data = _lzw_encode(2, [0] * 16)
    out += bytes([2, len(data)]) + data + b"\x00"
    # frame 2: GCE transparent index 3, disposal none; 2x2 at (1,1):
    # [green, transparent, transparent, green]
    out += b"\x21\xf9\x04" + struct.pack("<BHB", 0x01, 5, 3) + b"\x00"
    out += b"\x2c" + struct.pack("<HHHHB", 1, 1, 2, 2, 0)
    data = _lzw_encode(2, [1, 3, 3, 1])
    out += bytes([2, len(data)]) + data + b"\x00"
    out += b"\x3b"
    frames, w, h = decode_gif_frames(bytes(out))
    assert len(frames) == 2
    img = np.frombuffer(frames[1][1], np.uint8).reshape(4, 4, 3)
    assert img[1, 1].tolist() == [0, 255, 0]
    assert img[1, 2].tolist() == [255, 0, 0]  # transparent → red kept
    assert img[2, 1].tolist() == [255, 0, 0]
    assert img[2, 2].tolist() == [0, 255, 0]


def test_interlaced_frame_decodes():
    # re-encode the flag's indices in interlaced row order and set
    # the interlace flag; the decoder must un-shuffle it
    img = _flag()
    plain = encode_gif([img.tobytes()], 14, 10)
    frames, _, _ = decode_gif_frames(plain)
    # build an interlaced variant by hand from the same palette
    pixels = [img.reshape(-1, 3)[i].tobytes() for i in range(140)]
    uniq = sorted(set(pixels))
    lut = {c: i for i, c in enumerate(uniq)}
    idx = [lut[p] for p in pixels]
    rows = [idx[r * 14 : (r + 1) * 14] for r in range(10)]
    order = (
        list(range(0, 10, 8))
        + list(range(4, 10, 8))
        + list(range(2, 10, 4))
        + list(range(1, 10, 2))
    )
    shuffled = [v for r in order for v in rows[r]]
    table = b"".join(uniq) + bytes(3 * (4 - len(uniq)))
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", 14, 10, 0x81, 0, 0) + table
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, 14, 10, 0x40)
    data = _lzw_encode(2, shuffled)
    out += bytes([2])
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    got, _, _ = decode_gif_frames(bytes(out))
    assert got[0][1] == frames[0][1]


def test_boundaries_and_multimodal():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"NOTAGIF")
    img = _flag()
    payload = encode_gif([img.tobytes()], 14, 10)
    sig = decode_media(payload, "image/gif")
    assert len(sig) == 14 * 10 * 3
    arr = image_rgb(payload, "image/gif")
    assert arr.shape == (10, 14, 3)
    assert isinstance(phash_image(payload, "image/gif"), int)
    # animated resize keeps the frame count and delays
    anim = encode_gif(
        [img.tobytes(), np.roll(img, 3, axis=1).tobytes()],
        14, 10, [30, 60],
    )
    small = resize_gif(anim, 7, 5)
    frames, w, h = decode_gif_frames(small)
    assert (w, h, len(frames)) == (7, 5, 2)
    assert [d for d, _ in frames] == [30, 60]


def test_spark_frame_sample_multiframe(spark):
    from nfl_data_pipeline_spark.operators.multimodal import (
        attach_media,
        frame_sample,
    )

    img = _flag()
    anim = encode_gif(
        [img.tobytes(), np.roll(img, 2, axis=0).tobytes(),
         np.roll(img, 4, axis=0).tobytes()],
        14, 10, [50, 100, 150],
    )
    df = attach_media(
        spark.createDataFrame([(1, anim)], "doc_id long, payload binary"),
        "payload",
        mime="image/gif",
    )
    rows = sorted(
        frame_sample(df, use_real_codec=True).collect(),
        key=lambda r: r["frame_ix"],
    )
    assert len(rows) == 3
    assert [r["frame_ms"] for r in rows] == [0, 50, 150]  # cumulative
    assert bytes(rows[0]["frame_bytes"]) == img.tobytes()


# ---------------------------------------------------------- properties

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=30, deadline=None)
@given(
    mcs=st.integers(2, 8),
    data=st.lists(st.integers(0, 255), min_size=0, max_size=600),
)
def test_gif_lzw_roundtrip_property(mcs, data):
    idx = [v % (1 << mcs) for v in data]
    assert _lzw_decode(mcs, _lzw_encode(mcs, idx)) == idx


@settings(max_examples=25, deadline=None)
@given(
    w=st.integers(1, 10),
    h=st.integers(1, 10),
    n_colors=st.integers(1, 6),
    n_frames=st.integers(1, 3),
    seed=st.integers(0, 2**31),
)
def test_gif_exact_palette_roundtrip_property(w, h, n_colors, n_frames, seed):
    rng = np.random.default_rng(seed)
    palette = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    frames = [
        palette[rng.integers(0, n_colors, size=h * w)].tobytes()
        for _ in range(n_frames)
    ]
    payload = encode_gif(frames, w, h, [10 * (i + 1) for i in range(n_frames)])
    got, w2, h2 = decode_gif_frames(payload)
    assert (w2, h2, len(got)) == (w, h, n_frames)
    for want, (_, raster) in zip(frames, got):
        assert raster == want
