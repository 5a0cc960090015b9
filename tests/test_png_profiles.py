"""16-bit and Adam7-interlaced PNG decode (operators/png.py, r11):
fixtures are assembled chunk-by-chunk in the test (our encoder
deliberately stays 8-bit sequential), with per-line filters applied
through the filter math the roundtrip tests already verify. 16-bit
samples are s·257 so the round(v/257) reduction round-trips the
8-bit reference exactly."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from nfl_data_pipeline_spark.operators.png import (
    _ADAM7,
    _SIG,
    _chunk,
    _filter_line,
    decode_png_raster,
)


def _build(w, h, depth, color, interlace, raw, plte=None):
    out = _SIG + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", w, h, depth, color, 0, 0, interlace)
    )
    if plte is not None:
        out += _chunk(b"PLTE", plte)
    out += _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    return out


def _filtered_rows(img_bytes, w, h, bpp, filters):
    """Apply a cycling filter choice per scanline (the stream form)."""
    stride = w * bpp
    out = bytearray()
    prev = None
    for y in range(h):
        line = img_bytes[y * stride : (y + 1) * stride]
        f = filters[y % len(filters)]
        out += bytes([f]) + _filter_line(line, prev, bpp, f)
        prev = line
    return bytes(out)


def _to16(img8: np.ndarray) -> bytes:
    return (img8.astype(">u2") * 257).tobytes()


def test_16bit_gray_mixed_filters():
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(9, 14), dtype=np.uint8)
    raw = _filtered_rows(_to16(img), 14, 9, 2, [0, 1, 2, 3, 4])
    payload = _build(14, 9, 16, 0, 0, raw)
    raster, w, h, ch = decode_png_raster(payload)
    assert (w, h, ch) == (14, 9, 1)
    assert raster == img.tobytes()


def test_16bit_rgb_paeth():
    rng = np.random.default_rng(6)
    img = rng.integers(0, 256, size=(7, 5, 3), dtype=np.uint8)
    raw = _filtered_rows(_to16(img), 5, 7, 6, [4])
    payload = _build(5, 7, 16, 2, 0, raw)
    raster, w, h, ch = decode_png_raster(payload)
    assert (w, h, ch) == (5, 7, 3)
    assert raster == img.tobytes()


def test_16bit_reduction_rounds_exactly():
    # 0→0, 128→0, 129→1, 257→1, 65535→255: round(v/257) boundaries
    vals = np.array([0, 128, 129, 257, 65535], dtype=">u2")
    raw = b"\x00" + vals.tobytes()
    payload = _build(5, 1, 16, 0, 0, raw)
    raster, _, _, _ = decode_png_raster(payload)
    assert list(raster) == [0, 0, 1, 1, 255]


def _adam7_stream(img_bytes, w, h, bpp, filters):
    """Slice the reference raster into the 7 reduced images and
    filter each pass independently (the spec's stream layout)."""
    out = bytearray()
    for x0, y0, xs, ys in _ADAM7:
        pw = (w - x0 + xs - 1) // xs
        ph = (h - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        sub = bytearray()
        for ry in range(ph):
            for rx in range(pw):
                src = ((y0 + ry * ys) * w + (x0 + rx * xs)) * bpp
                sub += img_bytes[src : src + bpp]
        out += _filtered_rows(bytes(sub), pw, ph, bpp, filters)
    return bytes(out)


def test_adam7_rgb_odd_dims():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8)
    raw = _adam7_stream(img.tobytes(), 13, 9, 3, [0, 2, 1, 4, 3])
    payload = _build(13, 9, 8, 2, 1, raw)
    raster, w, h, ch = decode_png_raster(payload)
    assert (w, h, ch) == (13, 9, 3)
    assert raster == img.tobytes()


def test_adam7_16bit_gray():
    rng = np.random.default_rng(8)
    img = rng.integers(0, 256, size=(10, 10), dtype=np.uint8)
    raw = _adam7_stream(_to16(img), 10, 10, 2, [1, 4])
    payload = _build(10, 10, 16, 0, 1, raw)
    raster, w, h, ch = decode_png_raster(payload)
    assert (w, h, ch) == (10, 10, 1)
    assert raster == img.tobytes()


def test_adam7_palette():
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4) % 4
    plte = bytes(
        [255, 0, 0, 0, 255, 0, 0, 0, 255, 77, 88, 99]
    )
    raw = _adam7_stream(idx.tobytes(), 4, 3, 1, [0])
    payload = _build(4, 3, 8, 3, 1, raw, plte=plte)
    raster, w, h, ch = decode_png_raster(payload)
    assert (w, h, ch) == (4, 3, 3)
    want = b"".join(
        plte[3 * i : 3 * i + 3] for i in idx.flatten().tolist()
    )
    assert raster == want


def test_adam7_single_pixel():
    # 1×1: only pass 1 contains data; passes 2-7 are empty and must
    # contribute zero bytes to the stream walk
    raw = _adam7_stream(b"\x42", 1, 1, 1, [0])
    payload = _build(1, 1, 8, 0, 1, raw)
    raster, w, h, ch = decode_png_raster(payload)
    assert (w, h, ch, raster) == (1, 1, 1, b"\x42")


def test_16bit_palette_is_invalid():
    with pytest.raises(ValueError, match="16-bit"):
        decode_png_raster(
            _build(2, 2, 16, 3, 0, b"\x00\x00\x00\x00\x00", b"\x00" * 6)
        )


def test_16bit_ppm_decodes_and_resizes():
    """16-bit P6 (two-byte big-endian samples): decode_media
    normalizes by maxval, and the resize path preserves the depth
    through a nearest-neighbor gather."""
    import numpy as np

    from nfl_data_pipeline_spark.operators.multimodal import (
        decode_ppm,
        resize_ppm,
    )

    rng = np.random.default_rng(9)
    img = rng.integers(0, 65536, size=(4, 6, 3), dtype=np.uint16)
    payload = b"P6\n6 4\n65535\n" + img.astype(">u2").tobytes()
    sig, w, h = decode_ppm(payload)
    assert (w, h) == (6, 4)
    assert sig == pytest.approx(
        (img.astype(np.float64) / 65535).flatten().tolist()
    )
    small = resize_ppm(payload, 3, 2)
    sig2, w2, h2 = decode_ppm(small)
    assert (w2, h2) == (3, 2)
    ys, xs = (np.arange(2) * 4) // 2, (np.arange(3) * 6) // 3
    want = img[ys][:, xs].astype(np.float64) / 65535
    assert sig2 == pytest.approx(want.flatten().tolist())


def _pack_subbyte(samples, depth):
    """Pack one row of samples MSB-first at ``depth`` bits."""
    per = 8 // depth
    row = bytearray((len(samples) + per - 1) // per)
    for x, v in enumerate(samples):
        row[x // per] |= v << (8 - depth * (x % per + 1))
    return bytes(row)


def _subbyte_stream(img, depth, filters):
    h, w = img.shape
    rows = [_pack_subbyte(img[y].tolist(), depth) for y in range(h)]
    out = bytearray()
    prev = None
    for y, r in enumerate(rows):
        f = filters[y % len(filters)]
        out += bytes([f]) + _filter_line(r, prev, 1, f)
        prev = r
    return bytes(out)


@pytest.mark.parametrize("depth", [1, 2, 4])
def test_subbyte_gray(depth):
    """1/2/4-bit grayscale: MSB-first unpacking with the exact
    v·255/(2^d−1) scale, filters applied at the byte level with
    bpp=1 (spec 9.2), partial trailing bytes handled."""
    rng = np.random.default_rng(depth)
    img = rng.integers(0, 1 << depth, size=(6, 11), dtype=np.uint8)
    raw = _subbyte_stream(img, depth, [0, 1, 2, 3, 4])
    payload = _build(11, 6, depth, 0, 0, raw)
    raster, w, h, ch = decode_png_raster(payload)
    assert (w, h, ch) == (11, 6, 1)
    want = (img.astype(int) * 255 // ((1 << depth) - 1)).astype(
        np.uint8
    )
    assert raster == want.tobytes()


def test_subbyte_palette_adam7():
    """2-bit palette + Adam7 together: per-pass bit packing with
    byte-padded rows, indices unscaled into the PLTE expansion."""
    rng = np.random.default_rng(11)
    idx = rng.integers(0, 4, size=(9, 7), dtype=np.uint8)
    plte = bytes(range(12))
    out = bytearray()
    for x0, y0, xs, ys in _ADAM7:
        pw = (7 - x0 + xs - 1) // xs
        ph = (9 - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        sub = idx[y0::ys, x0::xs]
        out += _subbyte_stream(sub, 2, [0, 1])
    payload = _build(7, 9, 2, 3, 1, bytes(out), plte=plte)
    raster, w, h, ch = decode_png_raster(payload)
    assert (w, h, ch) == (7, 9, 3)
    want = b"".join(
        plte[3 * i : 3 * i + 3] for i in idx.flatten().tolist()
    )
    assert raster == want


def test_1bit_gray_adam7():
    rng = np.random.default_rng(13)
    img = rng.integers(0, 2, size=(10, 9), dtype=np.uint8)
    out = bytearray()
    for x0, y0, xs, ys in _ADAM7:
        sub = img[y0::ys, x0::xs]
        if sub.size == 0:
            continue
        out += _subbyte_stream(sub, 1, [0, 2])
    payload = _build(9, 10, 1, 0, 1, bytes(out))
    raster, w, h, ch = decode_png_raster(payload)
    assert (w, h, ch) == (9, 10, 1)
    assert raster == (img * 255).tobytes()
