"""Progressive JPEG decode (operators/jpeg.py, T.81 §G): streams are
assembled by an independent in-test progressive encoder (Annex-K-free
flat tables, own canonical-code builder via test_codec_fixtures) and
must decode to the SAME raster as the equivalent baseline stream —
same quantized coefficients, two marker-stream shapes. Covers DC
first/refinement (interleaved and single-component), AC spectral
bands with cross-block EOBRUN and ZRL, AC successive-approximation
refinement with correction bits, 4:2:0 subsampling, and restart
markers with predictor reset."""

from __future__ import annotations

import struct

import numpy as np

from nfl_data_pipeline_spark.operators.jpeg import (
    _C,
    _ZIG_IDX,
    _pad_to,
    _quantized_block,
    _scaled_quant,
    _Q_LUMA,
    _Q_CHROMA,
    decode_jpeg_raster,
    encode_jpeg,
)
from tests.test_codec_fixtures import _W, _codes, _seg

# flat tables sized for every symbol progressive scans can emit:
# DC categories 0..11 at 5 bits; AC (run, size 0..10) at 9 bits —
# including the EOBn family (size 0, run 0..14) and ZRL
_DC_BITS = [0, 0, 0, 0, 12] + [0] * 11
_DC_VALS = list(range(12))
_AC_SYMS = sorted(
    {(r << 4) | s for r in range(16) for s in range(11)} - {0xFF}
)
_AC_BITS = [0] * 16
_AC_BITS[8] = len(_AC_SYMS)
_AC_VALS = _AC_SYMS
_DC_T = (_DC_BITS, _DC_VALS)
_AC_T = (_AC_BITS, _AC_VALS)
_DCC = _codes(*_DC_T)
_ACC = _codes(*_AC_T)


def _emit(w, codes, sym):
    ln, code = codes[sym]
    w.put(code, ln)


def _emit_mag(w, v):
    # DC magnitude category + extra bits (T.81 F.1.2.1)
    if v == 0:
        _emit(w, _DCC, 0)
        return
    size = abs(v).bit_length()
    _emit(w, _DCC, size)
    extra = v if v > 0 else v + (1 << size) - 1
    w.put(extra, size)


def _trunc(v, al):
    # AC point transform: divide by 2^Al truncating TOWARD ZERO
    return v // (1 << al) if v >= 0 else -((-v) // (1 << al))


def _dht(cls, tid, table):
    bits, vals = table
    return _seg(0xC4, bytes([(cls << 4) | tid] + bits + vals))


def _dqt(tid, q):
    zz = q.flatten()[_ZIG_IDX].astype(np.uint8)
    return _seg(0xDB, bytes([tid]) + zz.tobytes())


class _ProgressiveWriter:
    """Assemble a SOF2 stream from per-component zigzag coefficient
    arrays; each scan's entropy data is encoded per §G."""

    def __init__(self, W, H, comps, quants):
        # comps: [(cid, h, v, tq, blocks (bh, bw, 64) int)]
        self.W, self.H = W, H
        self.comps = comps
        self.out = bytearray(b"\xff\xd8")
        for tid, q in quants.items():
            self.out += _dqt(tid, q)
        sof = struct.pack(">BHHB", 8, H, W, len(comps))
        for cid, h_, v_, tq, _ in comps:
            sof += bytes([cid, (h_ << 4) | v_, tq])
        self.out += _seg(0xC2, sof)
        self.out += _dht(0, 0, _DC_T) + _dht(1, 0, _AC_T)
        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        self.mcux = (W + 8 * hmax - 1) // (8 * hmax)
        self.mcuy = (H + 8 * vmax - 1) // (8 * vmax)
        self.hmax, self.vmax = hmax, vmax

    def _full_grid(self, cid):
        cid_, h_, v_, _, blocks = next(
            c for c in self.comps if c[0] == cid
        )
        cw = (self.W * h_ + self.hmax - 1) // self.hmax
        ch = (self.H * v_ + self.vmax - 1) // self.vmax
        return blocks, (ch + 7) // 8, (cw + 7) // 8

    def _sos(self, scan_ids, ss, se, ah, al):
        body = bytes([len(scan_ids)])
        for cid in scan_ids:
            body += bytes([cid, 0x00])
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    def dc_first(self, al, restart_each=False):
        ids = [c[0] for c in self.comps]
        self.out += self._sos(ids, 0, 0, 0, al)
        if restart_each:
            self.out += b""  # DRI emitted by caller before this scan
        preds = {c[0]: 0 for c in self.comps}
        if len(self.comps) > 1:
            w = _W()
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    for cid, h_, v_, _, blocks in self.comps:
                        for by in range(v_):
                            for bx in range(h_):
                                v = int(
                                    blocks[my * v_ + by, mx * h_ + bx, 0]
                                ) >> al
                                _emit_mag(w, v - preds[cid])
                                preds[cid] = v
            self.out += w.bytes_()
        else:
            cid = ids[0]
            blocks, bh, bw = self._full_grid(cid)
            segs = []
            w = _W()
            for by in range(bh):
                for bx in range(bw):
                    if restart_each and (by or bx):
                        segs.append(w.bytes_())
                        w = _W()
                        preds[cid] = 0
                    v = int(blocks[by, bx, 0]) >> al
                    _emit_mag(w, v - preds[cid])
                    preds[cid] = v
            segs.append(w.bytes_())
            for i, s in enumerate(segs):
                self.out += s
                if i < len(segs) - 1:
                    self.out += bytes([0xFF, 0xD0 + (i % 8)])

    def dc_refine(self, al):
        ids = [c[0] for c in self.comps]
        self.out += self._sos(ids, 0, 0, al + 1, al)
        w = _W()
        if len(self.comps) > 1:
            for my in range(self.mcuy):
                for mx in range(self.mcux):
                    for cid, h_, v_, _, blocks in self.comps:
                        for by in range(v_):
                            for bx in range(h_):
                                w.put(
                                    (int(
                                        blocks[
                                            my * v_ + by, mx * h_ + bx, 0
                                        ]
                                    ) >> al) & 1,
                                    1,
                                )
        else:
            blocks, bh, bw = self._full_grid(ids[0])
            for by in range(bh):
                for bx in range(bw):
                    w.put((int(blocks[by, bx, 0]) >> al) & 1, 1)
        self.out += w.bytes_()

    def ac_first(self, cid, ss, se, al):
        self.out += self._sos([cid], ss, se, 0, al)
        blocks, bh, bw = self._full_grid(cid)
        w = _W()
        eobrun = 0

        def flush_eob():
            nonlocal eobrun
            while eobrun > 0:
                r = min(eobrun.bit_length() - 1, 14)
                n = min(eobrun, (2 << r) - 1, (1 << r) + ((1 << r) - 1))
                _emit(w, _ACC, r << 4)
                if r:
                    w.put(n - (1 << r), r)
                eobrun -= n

        for by in range(bh):
            for bx in range(bw):
                blk = blocks[by, bx]
                ts = [_trunc(int(blk[k]), al) for k in range(64)]
                last = max(
                    (k for k in range(ss, se + 1) if ts[k]), default=None
                )
                if last is None:
                    eobrun += 1
                    continue
                flush_eob()
                run = 0
                for k in range(ss, se + 1):
                    t = ts[k]
                    if t == 0:
                        run += 1
                        continue
                    while run > 15:
                        _emit(w, _ACC, 0xF0)  # ZRL
                        run -= 16
                    size = abs(t).bit_length()
                    _emit(w, _ACC, (run << 4) | size)
                    extra = t if t > 0 else t + (1 << size) - 1
                    w.put(extra, size)
                    run = 0
                if last < se:
                    eobrun += 1
        flush_eob()
        self.out += w.bytes_()

    def ac_refine(self, cid, ss, se, al):
        # per-block EOB form (eobrun always 1): every block with
        # trailing history/zero coefficients ends in an explicit EOB
        # whose correction bits follow (G.1.2.3)
        self.out += self._sos([cid], ss, se, al + 1, al)
        blocks, bh, bw = self._full_grid(cid)
        w = _W()
        for by in range(bh):
            for bx in range(bw):
                blk = blocks[by, bx]
                run = 0
                pending: list[int] = []
                emitted_any = False
                for k in range(ss, se + 1):
                    final = int(blk[k])
                    before = _trunc(final, al + 1)
                    if before != 0:
                        pending.append((abs(final) >> al) & 1)
                        continue
                    if _trunc(final, al) == 0:
                        run += 1
                        continue
                    while run > 15:
                        _emit(w, _ACC, 0xF0)
                        for b in pending:
                            w.put(b, 1)
                        pending = []
                        run -= 16
                    _emit(w, _ACC, (run << 4) | 1)
                    w.put(1 if final > 0 else 0, 1)
                    for b in pending:
                        w.put(b, 1)
                    pending = []
                    run = 0
                    emitted_any = True
                if run > 0 or pending or not emitted_any:
                    _emit(w, _ACC, 0x00)  # EOB (run 1)
                    for b in pending:
                        w.put(b, 1)
        self.out += w.bytes_()

    def finish(self) -> bytes:
        return bytes(self.out + b"\xff\xd9")


def _gradient(W=24, H=17):
    x = np.arange(W)[None, :] * 3
    y = np.arange(H)[:, None] * 5
    return ((x + y) % 256).astype(np.uint8)


def _gray_blocks(img, quality=85):
    q = _scaled_quant(_Q_LUMA, quality)
    H, W = img.shape
    bh, bw = (H + 7) // 8, (W + 7) // 8
    padded = _pad_to(img.astype(np.float64), bh * 8, bw * 8)
    blocks = np.zeros((bh, bw, 64), np.int64)
    for by in range(bh):
        for bx in range(bw):
            blocks[by, bx] = _quantized_block(padded, by * 8, bx * 8, q)
    return blocks, q


def test_progressive_equals_baseline_gray():
    """Same quantized coefficients through two stream shapes: our
    baseline encoder vs the in-test progressive assembler (DC at
    Al=1 + refinement, split AC bands at Al=1 + full-band
    refinement). Rasters must agree within IDCT float-order slack."""
    img = _gradient()
    blocks, q = _gray_blocks(img)
    base = encode_jpeg(img.tobytes(), 24, 17, channels=1, quality=85)
    want = np.frombuffer(
        decode_jpeg_raster(base)[0], np.uint8
    ).astype(int)

    pw = _ProgressiveWriter(24, 17, [(1, 1, 1, 0, blocks)], {0: q})
    pw.dc_first(al=1)
    pw.ac_first(1, 1, 5, al=1)
    pw.ac_first(1, 6, 63, al=1)
    pw.dc_refine(al=0)
    pw.ac_refine(1, 1, 63, al=0)
    got_raster, W_, H_, ch = decode_jpeg_raster(pw.finish())
    assert (W_, H_, ch) == (24, 17, 1)
    got = np.frombuffer(got_raster, np.uint8).astype(int)
    assert np.abs(got - want).max() <= 1


def test_progressive_color_420_interleaved_dc():
    """4:2:0 color: interleaved DC-first scan over 2×2 luma + chroma
    blocks, per-component AC scans on the non-interleaved grids,
    successive approximation on everything."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(14, 11, 3), dtype=np.uint8)
    base = encode_jpeg(
        img.tobytes(), 11, 14, channels=3, quality=85, subsample=True
    )
    want = np.frombuffer(
        decode_jpeg_raster(base)[0], np.uint8
    ).astype(int)

    # reproduce the encoder's plane math to get its exact coefficients
    f = img.astype(np.float64)
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    H2, W2 = 14, 12
    cb2 = _pad_to(cb, H2, W2).reshape(7, 2, 6, 2).mean(axis=(1, 3))
    cr2 = _pad_to(cr, H2, W2).reshape(7, 2, 6, 2).mean(axis=(1, 3))
    ql = _scaled_quant(_Q_LUMA, 85)
    qc = _scaled_quant(_Q_CHROMA, 85)
    planes = [
        (np.clip(y, 0, 255), 2, 2, ql),
        (np.clip(cb2, 0, 255), 1, 1, qc),
        (np.clip(cr2, 0, 255), 1, 1, qc),
    ]
    comps = []
    for cid, (p, fh, fv, q) in enumerate(planes, start=1):
        bh, bw = fv * 1, fh * 1  # mcux = mcuy = 1 at 11x14 4:2:0
        padded = _pad_to(p, bh * 8, bw * 8)
        blocks = np.zeros((bh, bw, 64), np.int64)
        for by in range(bh):
            for bx in range(bw):
                blocks[by, bx] = _quantized_block(
                    padded, by * 8, bx * 8, q
                )
        comps.append((cid, fh, fv, 0 if cid == 1 else 1, blocks))
    pw = _ProgressiveWriter(11, 14, comps, {0: ql, 1: qc})
    pw.dc_first(al=1)
    for cid in (1, 2, 3):
        pw.ac_first(cid, 1, 63, al=1)
    pw.dc_refine(al=0)
    for cid in (1, 2, 3):
        pw.ac_refine(cid, 1, 63, al=0)
    got_raster, W_, H_, ch = decode_jpeg_raster(pw.finish())
    assert (W_, H_, ch) == (11, 14, 3)
    got = np.frombuffer(got_raster, np.uint8).astype(int)
    assert np.abs(got - want).max() <= 1


def test_progressive_eobrun_zrl_and_band_split():
    """Sparse synthetic coefficients across 6 blocks: consecutive
    empty-band blocks (cross-block EOBn with extension bits), a >16
    zero run inside a block (ZRL), and content at k=63. Reference =
    direct numpy dequant+IDCT of the coefficient array."""
    bh, bw = 1, 6
    q = np.ones((8, 8), np.int64)
    blocks = np.zeros((bh, bw, 64), np.int64)
    blocks[0, 0, 0] = 80
    blocks[0, 0, 1] = 12
    blocks[0, 0, 63] = -7  # forces a long zero run + high band
    blocks[0, 5, 0] = -40
    blocks[0, 5, 30] = 5  # blocks 1..4 are EOB-run blocks (run 4)
    pw = _ProgressiveWriter(48, 8, [(1, 1, 1, 0, blocks)], {0: q})
    pw.dc_first(al=0)
    pw.ac_first(1, 1, 20, al=0)
    pw.ac_first(1, 21, 63, al=0)
    got_raster, W_, H_, ch = decode_jpeg_raster(pw.finish())
    got = np.frombuffer(got_raster, np.uint8).reshape(8, 48).astype(int)

    want = np.zeros((8, 48))
    for bx in range(bw):
        nat = np.zeros(64)
        nat[_ZIG_IDX] = blocks[0, bx].astype(np.float64)
        blk = _C.T @ nat.reshape(8, 8) @ _C + 128.0
        want[:, bx * 8 : (bx + 1) * 8] = blk
    want = np.clip(np.round(want), 0, 255).astype(int)
    assert np.abs(got - want).max() <= 1


def test_progressive_dc_restart_resets_predictor():
    """DRI=1 on a single-component DC scan: RSTn between blocks, the
    predictor resets — each block's DC is coded absolute."""
    bh, bw = 1, 3
    q = np.ones((8, 8), np.int64)
    blocks = np.zeros((bh, bw, 64), np.int64)
    blocks[0, 0, 0] = 64
    blocks[0, 1, 0] = -64
    blocks[0, 2, 0] = 16
    pw = _ProgressiveWriter(24, 8, [(1, 1, 1, 0, blocks)], {0: q})
    pw.out += _seg(0xDD, struct.pack(">H", 1))
    pw.dc_first(al=0, restart_each=True)
    pw.out += _seg(0xDD, struct.pack(">H", 0))  # DRI persists per spec
    pw.ac_first(1, 1, 63, al=0)
    got_raster, _, _, _ = decode_jpeg_raster(pw.finish())
    got = np.frombuffer(got_raster, np.uint8).reshape(8, 24)
    assert set(got[:, :8].flatten().tolist()) == {136}
    assert set(got[:, 8:16].flatten().tolist()) == {120}
    assert set(got[:, 16:].flatten().tolist()) == {130}


def test_ac_scan_restart_resets_eobrun():
    """DRI=2 on an AC band scan: an EOB run terminates at the
    restart boundary and the decoder must reset eobrun at RSTn — a
    decoder that carries it over mis-attributes the next segment's
    blocks. Entropy segments hand-assembled around the marker."""
    bh, bw = 1, 4
    q = np.ones((8, 8), np.int64)
    blocks = np.zeros((bh, bw, 64), np.int64)
    blocks[0, 0, 0] = 8
    blocks[0, 1, 0] = 8
    blocks[0, 2, 0] = 8
    blocks[0, 3, 0] = 8
    blocks[0, 2, 3] = 9  # only block 2 has AC content
    pw = _ProgressiveWriter(32, 8, [(1, 1, 1, 0, blocks)], {0: q})
    pw.dc_first(al=0)  # DRI not yet set: no restarts here
    pw.out += _seg(0xDD, struct.pack(">H", 2))
    pw.out += pw._sos([1], 1, 63, 0, 0)
    # segment 1: blocks 0-1 via one EOB2 (symbol 0x10 + 1 ext bit)
    w1 = _W()
    _emit(w1, _ACC, 0x10)
    w1.put(0, 1)
    # segment 2 (after RST0): block 2 = run-2 value 9, EOB; block 3 EOB
    w2 = _W()
    _emit(w2, _ACC, (2 << 4) | 4)
    w2.put(9, 4)
    _emit(w2, _ACC, 0x00)
    _emit(w2, _ACC, 0x00)
    pw.out += w1.bytes_() + b"\xff\xd0" + w2.bytes_()
    got_raster, _, _, _ = decode_jpeg_raster(pw.finish())
    got = np.frombuffer(got_raster, np.uint8).reshape(8, 32).astype(int)

    want = np.zeros((8, 32))
    for bx in range(bw):
        nat = np.zeros(64)
        nat[_ZIG_IDX] = blocks[0, bx].astype(np.float64)
        want[:, bx * 8 : (bx + 1) * 8] = (
            _C.T @ nat.reshape(8, 8) @ _C + 128.0
        )
    want = np.clip(np.round(want), 0, 255).astype(int)
    assert np.abs(got - want).max() <= 1


# ---- 12-bit precision (extended sequential SOF1 + progressive) ------

_DC12_BITS = [0, 0, 0, 0, 16] + [0] * 11  # categories 0..15 at 5 bits
_DC12_VALS = list(range(16))
_DC12 = _codes(_DC12_BITS, _DC12_VALS)


def _dqt16(tid, q):
    zz = q.flatten()[_ZIG_IDX].astype(">u2")
    return _seg(0xDB, bytes([(1 << 4) | tid]) + zz.tobytes())


def _emit_dc12(w, v):
    if v == 0:
        ln, code = _DC12[0]
        w.put(code, ln)
        return
    size = abs(v).bit_length()
    ln, code = _DC12[size]
    w.put(code, ln)
    extra = v if v > 0 else v + (1 << size) - 1
    w.put(extra, size)


def test_12bit_sequential_dc_only():
    """Extended sequential (SOF1) 12-bit grayscale: 16-bit DQT,
    DC size category 14, level shift 2048, exact round(v·255/4095)
    reduction — 3276 → 204 exactly."""
    q = np.ones((8, 8), np.int64)
    w = _W()
    _emit_dc12(w, (3276 - 2048) * 8)
    ln, code = _ACC[0x00]
    w.put(code, ln)  # EOB
    out = bytearray(b"\xff\xd8")
    out += _dqt16(0, q)
    sof = struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0])
    out += _seg(0xC1, sof)
    out += _dht(0, 0, (_DC12_BITS, _DC12_VALS)) + _dht(1, 0, _AC_T)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += _seg(0xDA, sos)
    out += w.bytes_() + b"\xff\xd9"
    raster, W_, H_, ch = decode_jpeg_raster(bytes(out))
    assert (W_, H_, ch) == (8, 8, 1)
    assert set(raster) == {204}


def test_12bit_progressive_with_refinement():
    """12-bit progressive: DC first at Al=2 + two refinement passes,
    16-bit quant tables — the successive-approximation arithmetic
    must track the wider sample range."""
    q = np.ones((8, 8), np.int64)
    blocks = np.zeros((1, 1, 64), np.int64)
    blocks[0, 0, 0] = (3276 - 2048) * 8 + 3  # exercise low bits
    pw = _ProgressiveWriter(8, 8, [(1, 1, 1, 0, blocks)], {0: q})
    # swap in 12-bit pieces: rebuild header with SOF2 prec=12 + DQT16
    out = bytearray(b"\xff\xd8")
    out += _dqt16(0, q)
    sof = struct.pack(">BHHB", 12, 8, 8, 1) + bytes([1, 0x11, 0])
    out += _seg(0xC2, sof)
    out += _dht(0, 0, (_DC12_BITS, _DC12_VALS)) + _dht(1, 0, _AC_T)
    pw.out = out
    # DC first at Al=2 (categories computed against the shifted val)
    pw.out += pw._sos([1], 0, 0, 0, 2)
    w = _W()
    _emit_dc12(w, int(blocks[0, 0, 0]) >> 2)
    pw.out += w.bytes_()
    for al in (1, 0):  # two refinement passes
        pw.out += pw._sos([1], 0, 0, al + 1, al)
        w = _W()
        w.put((int(blocks[0, 0, 0]) >> al) & 1, 1)
        pw.out += w.bytes_()
    pw.out += pw._sos([1], 1, 63, 0, 0)
    w = _W()
    ln, code = _ACC[0x00]
    w.put(code, ln)
    pw.out += w.bytes_()
    raster, W_, H_, ch = decode_jpeg_raster(pw.finish())
    assert (W_, H_, ch) == (8, 8, 1)
    # DC 9827 → sample 2048 + 9827/8 = 3276.375 → ·255/4095 ≈ 204.02
    assert set(raster) == {204}


def test_12bit_color_neutral_chroma_unbiased():
    """12-bit 3-component (1:1:1) sequential: neutral chroma DC (0
    after level shift) must decode to exactly R==G==B. The neutral
    chroma level after the 8-bit rescale is 2048·255/4095 ≈ 127.53,
    not 128 — subtracting a hardcoded 128 in the color convert biased
    R/B by ~-0.66/-0.83 on every pixel (r11 ADVICE jpeg.py:635)."""
    q = np.ones((8, 8), np.int64)
    w = _W()
    # interleaved MCU: Y then Cb then Cr, DC + EOB each
    _emit_dc12(w, (3276 - 2048) * 8)  # Y → 204.02 → 204
    ln, code = _ACC[0x00]
    w.put(code, ln)
    for _ in range(2):  # Cb, Cr at neutral (DC diff 0)
        _emit_dc12(w, 0)
        w.put(code, ln)
    out = bytearray(b"\xff\xd8")
    out += _dqt16(0, q)
    sof = struct.pack(">BHHB", 12, 8, 8, 3)
    for cid in (1, 2, 3):
        sof += bytes([cid, 0x11, 0])
    out += _seg(0xC1, sof)
    out += _dht(0, 0, (_DC12_BITS, _DC12_VALS)) + _dht(1, 0, _AC_T)
    sos = bytes([3]) + b"".join(
        bytes([cid, 0x00]) for cid in (1, 2, 3)
    ) + bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += w.bytes_() + b"\xff\xd9"
    raster, W_, H_, ch = decode_jpeg_raster(bytes(out))
    assert (W_, H_, ch) == (8, 8, 3)
    px = np.frombuffer(raster, np.uint8).reshape(8, 8, 3)
    # neutral chroma ⇒ grayscale, at the Y value (204), all channels
    assert px.min() == px.max() == 204


def test_progressive_zero_scans_raises():
    """SOF2 header that reaches EOI without a single SOS must raise
    like the baseline path does, not reconstruct an all-zero store
    into a solid mid-gray raster (r11 ADVICE jpeg.py:544)."""
    import pytest

    out = bytearray(b"\xff\xd8")
    out += _dqt(0, np.ones((8, 8), np.int64))
    sof = struct.pack(">BHHB", 8, 8, 8, 1) + bytes([1, 0x11, 0])
    out += _seg(0xC2, sof)
    out += _dht(0, 0, _DC_T) + _dht(1, 0, _AC_T)
    out += b"\xff\xd9"
    with pytest.raises(ValueError, match="without SOS"):
        decode_jpeg_raster(bytes(out))
