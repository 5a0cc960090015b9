"""Third-party-shaped codec conformance fixtures (VERDICT r10 next
#6): the encoder-drives-decoder tests can only exercise the stream
shapes OUR encoders emit. These fixtures are assembled independently
in the test, byte-by-byte from the public specs, with feature
combinations the in-repo encoders never produce:

- GIF: local color tables (per-frame palettes our encoder never
  writes), GCE scoping (a frame WITHOUT its own GCE must not inherit
  the previous frame's transparency/disposal — GIF89a §23), mixed
  disposal 2/3 with sub-rectangle frames, interlace + local palette
  combined. Expected rasters come from an independent numpy
  compositor implementing the spec's composition rules, and the
  decoded sequences are additionally hash-pinned.
- JPEG: streams entropy-coded with the T.81 Annex K.3 TYPICAL
  Huffman tables (ours uses flat tables), separate luma/chroma table
  ids selected per component in SOS (ours always writes 0x00), an
  all-ones quant table for exact integer expectations, and restart
  markers with DC-predictor reset. Expected pixels computed from the
  public DCT/YCbCr formulas in-test.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

from nfl_data_pipeline_spark.operators.gif import (
    _lzw_encode,
    decode_gif_frames,
)
from nfl_data_pipeline_spark.operators.jpeg import decode_jpeg_raster

# ------------------------------------------------------------------ GIF


def _subblocked(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    return bytes(out + b"\x00")


def _interlace_rows(h: int) -> list[int]:
    return (
        list(range(0, h, 8))
        + list(range(4, h, 8))
        + list(range(2, h, 4))
        + list(range(1, h, 2))
    )


def build_gif(W, H, gct, bg, frames) -> bytes:
    """Independent GIF89a writer for fixtures. ``gct`` is a list of
    RGB tuples (power-of-two length); each frame is a dict with keys
    left/top/w/h/indices and optional lct, interlace, gce=(disposal,
    transparent_ix_or_None, delay_cs)."""
    out = bytearray(b"GIF89a")
    gbits = max(1, (len(gct) - 1).bit_length())
    out += struct.pack("<HHBBB", W, H, 0x80 | (gbits - 1), bg, 0)
    out += b"".join(bytes(c) for c in gct)
    for f in frames:
        gce = f.get("gce")
        if gce is not None:
            disp, tix, delay = gce
            flags = (disp << 2) | (1 if tix is not None else 0)
            out += b"\x21\xf9\x04" + struct.pack(
                "<BHB", flags, delay, tix or 0
            ) + b"\x00"
        lct = f.get("lct")
        packed = 0
        if lct:
            lbits = max(1, (len(lct) - 1).bit_length())
            packed |= 0x80 | (lbits - 1)
        if f.get("interlace"):
            packed |= 0x40
        out += b"\x2c" + struct.pack(
            "<HHHHB", f["left"], f["top"], f["w"], f["h"], packed
        )
        if lct:
            out += b"".join(bytes(c) for c in lct)
        idx = f["indices"]
        if f.get("interlace"):
            rows = [
                idx[r * f["w"] : (r + 1) * f["w"]] for r in range(f["h"])
            ]
            idx = [v for r in _interlace_rows(f["h"]) for v in rows[r]]
        ncol = len(lct or gct)
        mcs = max(2, (ncol - 1).bit_length())
        out += bytes([mcs]) + _subblocked(_lzw_encode(mcs, idx))
    out += b"\x3b"
    return bytes(out)


def reference_compose(W, H, gct, bg, frames):
    """Independent compositor: GIF89a 'restore' semantics by the
    book. Returns the list of full-canvas RGB arrays after each
    frame renders."""
    canvas = np.zeros((H, W, 3), np.uint8)
    canvas[:, :] = gct[bg]
    out = []
    for f in frames:
        disp, tix = 0, None
        if f.get("gce") is not None:
            disp, tix, _ = f["gce"]
        table = f.get("lct") or gct
        l, t, w, h = f["left"], f["top"], f["w"], f["h"]
        before = canvas.copy()
        for r in range(h):
            for c in range(w):
                ix = f["indices"][r * w + c]
                if ix == tix:
                    continue
                canvas[t + r, l + c] = table[ix]
        out.append(canvas.copy())
        if disp == 2:
            canvas[t : t + h, l : l + w] = gct[bg]
        elif disp == 3:
            canvas = before
    return out


def test_gce_scope_does_not_leak_to_next_frame():
    """GIF89a §23: a GCE governs only the FIRST following rendering
    block. Frame 1 declares index 1 transparent; frame 2 has NO GCE
    and paints index 1 everywhere — it must paint, not hole-punch."""
    gct = [(255, 0, 0), (0, 255, 0)]
    frames = [
        {"left": 0, "top": 0, "w": 4, "h": 4, "indices": [0] * 16,
         "gce": (0, 1, 0)},
        {"left": 0, "top": 0, "w": 4, "h": 4, "indices": [1] * 16},
    ]
    payload = build_gif(4, 4, gct, 0, frames)
    got, _, _ = decode_gif_frames(payload)
    want = reference_compose(4, 4, gct, 0, frames)
    assert got[1][1] == want[1].tobytes()
    assert np.frombuffer(got[1][1], np.uint8).reshape(4, 4, 3)[
        0, 0
    ].tolist() == [0, 255, 0]
    # and the delay does not leak either (frame 2 has no GCE → 0)
    assert got[1][0] == 0


def test_local_palette_animation_with_mixed_disposals():
    """4-frame animation: global-palette background, then sub-rect
    frames each with its OWN local palette (colors absent from the
    GCT), disposal 1 (keep), 2 (restore-background), 3
    (restore-previous), with a transparent hole in frame 3. Every
    composed canvas must match the independent compositor, and the
    whole decoded sequence is hash-pinned."""
    gct = [(10, 20, 30), (200, 200, 200), (0, 0, 0), (0, 0, 0)]
    lct_a = [(255, 0, 0), (0, 255, 0)]
    lct_b = [(0, 0, 255), (255, 255, 0)]
    lct_c = [(123, 45, 67), (89, 10, 11)]
    frames = [
        {"left": 0, "top": 0, "w": 6, "h": 6,
         "indices": [1 if (i // 6 + i % 6) % 2 else 0 for i in range(36)]},
        # keep (disposal 1): red/green checker patch persists
        {"left": 1, "top": 1, "w": 3, "h": 3, "lct": lct_a,
         "indices": [0, 1, 0, 1, 0, 1, 0, 1, 0], "gce": (1, None, 5)},
        # restore-background (2): blue/yellow patch shows for one
        # frame, then its rect reverts to the GCT background color
        {"left": 2, "top": 2, "w": 3, "h": 3, "lct": lct_b,
         "indices": [1, 1, 0, 0, 1, 1, 1, 0, 0], "gce": (2, None, 5)},
        # restore-previous (3) + transparency: index 1 punches through
        # to whatever the post-disposal-2 canvas held
        {"left": 0, "top": 0, "w": 4, "h": 4, "lct": lct_c,
         "indices": [0, 1, 1, 0] * 4, "gce": (3, 1, 5)},
        {"left": 4, "top": 4, "w": 2, "h": 2, "lct": lct_a,
         "indices": [1, 1, 1, 1]},
    ]
    payload = build_gif(6, 6, gct, 0, frames)
    got, w, h = decode_gif_frames(payload)
    want = reference_compose(6, 6, gct, 0, frames)
    assert (w, h) == (6, 6) and len(got) == len(want)
    for i, ((delay, raster), ref) in enumerate(zip(got, want)):
        assert raster == ref.tobytes(), f"frame {i} composition"
    assert [d for d, _ in got] == [0, 50, 50, 50, 0]
    digest = hashlib.sha256(b"".join(r for _, r in got)).hexdigest()
    assert digest == (
        "04a6607f1d24d32997bee0d14385043ac66d825231df923ec1c07ce968a67df1"
    )


def test_interlaced_subrect_with_local_palette():
    """Interlace and a local palette on a sub-rectangle frame — the
    combination (our encoder emits neither) must compose correctly
    over a global-palette first frame."""
    gct = [(50, 50, 50), (150, 150, 150)]
    lct = [(1, 2, 3), (250, 251, 252), (7, 8, 9), (99, 98, 97)]
    frames = [
        {"left": 0, "top": 0, "w": 10, "h": 12,
         "indices": [i % 2 for i in range(120)]},
        {"left": 1, "top": 2, "w": 8, "h": 9, "lct": lct,
         "interlace": True,
         "indices": [(i * 7) % 4 for i in range(72)]},
    ]
    payload = build_gif(10, 12, gct, 0, frames)
    got, _, _ = decode_gif_frames(payload)
    want = reference_compose(10, 12, gct, 0, frames)
    assert got[1][1] == want[1].tobytes()


# ----------------------------------------------------------------- JPEG
#
# T.81 Annex K.3 typical Huffman tables (public spec constants).

_K_DC_LUMA = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
_K_DC_CHROMA = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
# AC tables: only the symbols this fixture emits need correct codes,
# but the full BITS/VALS lists are the spec's (truncated VALS would
# change canonical code assignment). K.3.3.2 luma AC:
_K_AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_K_AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_K_AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_K_AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_K_AC_LUMA = (_K_AC_LUMA_BITS, _K_AC_LUMA_VALS)
_K_AC_CHROMA = (_K_AC_CHROMA_BITS, _K_AC_CHROMA_VALS)


def _codes(bits, vals):
    """Independent canonical Huffman assignment (T.81 Annex C): the
    test's own 6 lines, not the module's helper."""
    table, code, k = {}, 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[vals[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return table


class _W:
    def __init__(self):
        self.bits, self.out = [], bytearray()

    def put(self, value, n):
        for i in range(n - 1, -1, -1):
            self.bits.append((value >> i) & 1)

    def bytes_(self):
        bits = self.bits + [1] * (-len(self.bits) % 8)
        out = bytearray()
        for i in range(0, len(bits), 8):
            b = 0
            for bit in bits[i : i + 8]:
                b = (b << 1) | bit
            out.append(b)
            if b == 0xFF:
                out.append(0x00)  # byte stuffing
        return bytes(out)


def _put_dc(w, codes, diff):
    if diff == 0:
        size, extra = 0, 0
    else:
        size = abs(diff).bit_length()
        extra = diff if diff > 0 else diff + (1 << size) - 1
    ln, code = codes[size]
    w.put(code, ln)
    if size:
        w.put(extra, size)


def _put_eob(w, ac_codes):
    ln, code = ac_codes[0x00]
    w.put(code, ln)


def _seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def _dqt_ones(tid):
    return _seg(0xDB, bytes([tid]) + bytes([1] * 64))


def _dht(cls, tid, table):
    bits, vals = table
    return _seg(0xC4, bytes([(cls << 4) | tid] + bits + vals))


def _sof0(w, h, comps):
    body = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, samp, tq in comps:
        body += bytes([cid, samp, tq])
    return _seg(0xC0, body)


def _sos(scan):
    body = bytes([len(scan)])
    for cid, (td, ta) in scan:
        body += bytes([cid, (td << 4) | ta])
    return body + bytes([0, 63, 0])


def test_annex_k_tables_grayscale_dc_only():
    """8×8 grayscale, quant all-ones, DC=64 (→ pixel 64/8 + 128 =
    136 exactly), entropy-coded with the Annex K typical luma tables
    our encoder never uses."""
    dc_codes = _codes(*_K_DC_LUMA)
    ac_codes = _codes(*_K_AC_LUMA)
    w = _W()
    _put_dc(w, dc_codes, 64)
    _put_eob(w, ac_codes)
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones(0)
    out += _sof0(8, 8, [(1, 0x11, 0)])
    out += _dht(0, 0, _K_DC_LUMA) + _dht(1, 0, _K_AC_LUMA)
    out += _seg(0xDA, _sos([(1, (0, 0))]))
    out += w.bytes_() + b"\xff\xd9"
    raster, W_, H_, ch = decode_jpeg_raster(bytes(out))
    assert (W_, H_, ch) == (8, 8, 1)
    assert set(raster) == {136}


def test_annex_k_color_separate_chroma_tables():
    """3-component 4:4:4 single MCU using DC0/AC0 for Y and DC1/AC1
    for Cb/Cr — per-component table SELECTION in SOS, which our
    encoder never exercises (it writes 0x00 for every component).
    DC-only per component; expected RGB from the public YCbCr
    formulas."""
    ydc, yac = _codes(*_K_DC_LUMA), _codes(*_K_AC_LUMA)
    cdc, cac = _codes(*_K_DC_CHROMA), _codes(*_K_AC_CHROMA)
    # targets: Y=160, Cb=96, Cr=176 → DC = (v-128)*8 with q=1
    w = _W()
    _put_dc(w, ydc, (160 - 128) * 8)
    _put_eob(w, yac)
    _put_dc(w, cdc, (96 - 128) * 8)
    _put_eob(w, cac)
    _put_dc(w, cdc, (176 - 128) * 8)
    _put_eob(w, cac)
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones(0) + _dqt_ones(1)
    out += _sof0(8, 8, [(1, 0x11, 0), (2, 0x11, 1), (3, 0x11, 1)])
    out += _dht(0, 0, _K_DC_LUMA) + _dht(1, 0, _K_AC_LUMA)
    out += _dht(0, 1, _K_DC_CHROMA) + _dht(1, 1, _K_AC_CHROMA)
    out += _seg(0xDA, _sos([(1, (0, 0)), (2, (1, 1)), (3, (1, 1))]))
    out += w.bytes_() + b"\xff\xd9"
    raster, W_, H_, ch = decode_jpeg_raster(bytes(out))
    assert (W_, H_, ch) == (8, 8, 3)
    y, cb, cr = 160.0, 96.0 - 128.0, 176.0 - 128.0
    exp = [
        int(np.clip(round(y + 1.402 * cr), 0, 255)),
        int(np.clip(round(y - 0.344136 * cb - 0.714136 * cr), 0, 255)),
        int(np.clip(round(y + 1.772 * cb), 0, 255)),
    ]
    px = list(raster[:3])
    assert all(abs(a - b) <= 1 for a, b in zip(px, exp)), (px, exp)
    # DC-only blocks: every pixel identical
    assert len({raster[i : i + 3] for i in range(0, len(raster), 3)}) == 1


def test_restart_markers_reset_dc_prediction():
    """16×8 grayscale, DRI=1, RST0 between the two MCUs: each MCU's
    DC diff is coded against a RESET predictor (0), so both blocks
    decode to their absolute values — a decoder that fails to reset
    the predictor shows the second block shifted."""
    dc_codes = _codes(*_K_DC_LUMA)
    ac_codes = _codes(*_K_AC_LUMA)
    w1 = _W()
    _put_dc(w1, dc_codes, 64)  # block 1: 136
    _put_eob(w1, ac_codes)
    w2 = _W()
    _put_dc(w2, dc_codes, -64)  # block 2 vs RESET pred: 120
    _put_eob(w2, ac_codes)
    out = bytearray(b"\xff\xd8")
    out += _dqt_ones(0)
    out += _seg(0xDD, struct.pack(">H", 1))
    out += _sof0(16, 8, [(1, 0x11, 0)])
    out += _dht(0, 0, _K_DC_LUMA) + _dht(1, 0, _K_AC_LUMA)
    out += _seg(0xDA, _sos([(1, (0, 0))]))
    out += w1.bytes_() + b"\xff\xd0" + w2.bytes_() + b"\xff\xd9"
    raster, W_, H_, ch = decode_jpeg_raster(bytes(out))
    assert (W_, H_, ch) == (16, 8, 1)
    img = np.frombuffer(raster, np.uint8).reshape(8, 16)
    assert set(img[:, :8].flatten().tolist()) == {136}
    assert set(img[:, 8:].flatten().tolist()) == {120}
