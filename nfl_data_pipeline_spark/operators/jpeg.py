"""Baseline JPEG codec (ITU-T T.81 baseline sequential) in pure
numpy + stdlib — no imaging libraries.

Decoder: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS marker walk, canonical
Huffman decode over the byte-stuffed entropy stream (0xFF00
unstuffing, RSTn restart handling), DC prediction, dequant, inverse
zigzag, orthonormal IDCT, YCbCr→RGB, sampling factors 1 and 2 per
axis (4:4:4 / 4:2:2 / 4:2:0; chroma upsampled nearest). Reads the
quant/Huffman tables FROM THE STREAM, so it decodes real-world
baseline files regardless of which tables they ship. Progressive
(SOF2), arithmetic coding, and 12-bit precision raise
NotImplementedError explicitly — the same honest-boundary contract
as operators/png.py.

Encoder: baseline sequential 4:4:4 (or grayscale), IJG-style
quality-scaled quant tables, and GENERATED canonical Huffman tables
(DC symbols at 5 bits, AC symbols at 9 bits) written into the DHT
segments like any other tables — JPEG requires the tables to travel
in the file, so a valid self-describing choice beats reciting the
Annex K defaults, and the decoder exercises the same generic table
machinery a foreign file needs. The cost is a few percent of
compression ratio, which this repo does not chase.

Scale note: like the PNG codec this runs inside Arrow-batched
``mapInPandas`` stages (operators/multimodal.py); metadata pruning
decides WHICH payloads decode, numpy does the per-block math.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: IJG Annex-K-shaped base luminance quant table (public constants).
_Q_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)
_Q_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)


def _zigzag_order() -> list[tuple[int, int]]:
    """The JPEG zigzag scan as (row, col) pairs, generated from the
    diagonal rule (odd diagonals walk top→bottom, even bottom→top)
    instead of a recited 64-entry literal."""
    out = []
    for s in range(15):
        ij = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        out.extend(ij if s % 2 else ij[::-1])
    return out


_ZIG = _zigzag_order()
_ZIG_IDX = np.array([r * 8 + c for r, c in _ZIG])  # flat gather order

# orthonormal DCT-II basis: X = C @ x @ C.T, x = C.T @ X @ C
_C = np.zeros((8, 8))
for _k in range(8):
    for _n in range(8):
        _C[_k, _n] = np.cos((2 * _n + 1) * _k * np.pi / 16) * np.sqrt(
            0.25 if _k else 0.125
        )


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# ------------------------------------------------------------ bit streams


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.out.append(0x00)
                self._acc = 0
                self._n = 0

    def flush(self) -> None:
        if self._n:
            # pad with 1s per the spec
            self._acc = (self._acc << (8 - self._n)) | ((1 << (8 - self._n)) - 1)
            self.out.append(self._acc)
            if self._acc == 0xFF:
                self.out.append(0x00)
            self._acc = 0
            self._n = 0


class _BitReader:
    """Entropy-segment reader: unstuffs 0xFF00, stops at markers;
    ``restart()`` consumes an RSTn and realigns."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            if b == 0xFF:
                nxt = self.data[self.pos + 1] if self.pos + 1 < len(
                    self.data
                ) else None
                if nxt == 0x00:
                    self.pos += 2
                else:
                    raise ValueError("marker inside entropy decode")
            else:
                self.pos += 1
            self._acc = b
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def at_restart(self) -> bool:
        return (
            self.pos + 1 < len(self.data)
            and self.data[self.pos] == 0xFF
            and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        )

    def restart(self) -> None:
        self._acc = 0
        self._n = 0
        self.pos += 2


# --------------------------------------------------------------- huffman


def _canonical_codes(bits: list[int], vals: list[int]) -> dict:
    """BITS (count of codes per length 1..16) + HUFFVAL → {(length,
    code): value} by the canonical assignment of T.81 Annex C."""
    table = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


class _HuffEncoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.bits, self.vals = bits, vals
        self.codes = {
            v: (ln, c) for (ln, c), v in _canonical_codes(bits, vals).items()
        }

    def emit(self, w: _BitWriter, symbol: int) -> None:
        ln, code = self.codes[symbol]
        w.write(code, ln)


def _flat_table(symbols: list[int], length: int) -> _HuffEncoder:
    """A valid canonical table giving every symbol a code of the same
    ``length`` (requires len(symbols) < 2^length so the all-ones code
    stays unused, as T.81 canonical generation guarantees)."""
    if len(symbols) >= (1 << length):
        raise ValueError("too many symbols for flat code length")
    bits = [0] * 16
    bits[length - 1] = len(symbols)
    return _HuffEncoder(bits, list(symbols))


_DC_SYMS = list(range(12))
_AC_LUMA_SYMS = sorted(
    {0x00, 0xF0}
    | {(run << 4) | size for run in range(16) for size in range(1, 11)}
)
_ENC_DC = _flat_table(_DC_SYMS, 5)
_ENC_AC = _flat_table(_AC_LUMA_SYMS, 9)


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value → (size category, appended bits)."""
    size = int(abs(v)).bit_length()
    if v >= 0:
        return size, v
    return size, v + (1 << size) - 1


def _extend(v: int, size: int) -> int:
    if size == 0:
        return 0
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# ---------------------------------------------------------------- encode


def _quantized_block(
    padded: np.ndarray, by: int, bx: int, quant: np.ndarray
) -> np.ndarray:
    """One level-shifted 8×8 DCT block, quantized and zigzagged."""
    block = padded[by : by + 8, bx : bx + 8] - 128.0
    return np.round((_C @ block @ _C.T) / quant).astype(np.int64).flatten()[
        _ZIG_IDX
    ]


def _entropy_encode(
    w: _BitWriter, zz: np.ndarray, pred: int
) -> int:
    dc = int(zz[0])
    size, bits_v = _magnitude(dc - pred)
    _ENC_DC.emit(w, size)
    w.write(bits_v, size)
    run = 0
    nz = np.nonzero(zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for i in range(1, last + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            _ENC_AC.emit(w, 0xF0)  # ZRL
            run -= 16
        size, bits_v = _magnitude(v)
        _ENC_AC.emit(w, (run << 4) | size)
        w.write(bits_v, size)
        run = 0
    if last < 63:
        _ENC_AC.emit(w, 0x00)  # EOB
    return dc


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def _dqt_seg(tid: int, q: np.ndarray) -> bytes:
    return _seg(
        0xDB, bytes([tid]) + bytes(int(q.flatten()[i]) for i in _ZIG_IDX)
    )


def _dht_seg(cls: int, tid: int, enc: _HuffEncoder) -> bytes:
    return _seg(
        0xC4, bytes([(cls << 4) | tid]) + bytes(enc.bits) + bytes(enc.vals)
    )


def _pad_to(plane: np.ndarray, H: int, W: int) -> np.ndarray:
    h, w = plane.shape
    return np.pad(plane, ((0, H - h), (0, W - w)), mode="edge")


def encode_jpeg(
    raster: bytes,
    width: int,
    height: int,
    channels: int = 3,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode an 8-bit raster (row-major, interleaved) as a baseline
    sequential JPEG — 4:4:4 RGB by default, 4:2:0 with
    ``subsample=True`` (box-mean chroma downsample, 2×2 luma MCUs),
    single-component for grayscale. ``restart_interval`` emits
    DRI/RSTn markers every N MCUs. Lossy by nature; tests bound the
    roundtrip error instead of asserting equality — and the
    subsample/restart options exist precisely so the decoder's 4:2:0
    and restart paths are exercised by real streams."""
    if channels not in (1, 3):
        raise ValueError(f"unsupported channel count {channels}")
    img = np.frombuffer(raster, dtype=np.uint8).reshape(
        height, width, channels
    ).astype(np.float64)
    if channels == 3:
        r, g, b = img[:, :, 0], img[:, :, 1], img[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            H2, W2 = (height + 1) // 2 * 2, (width + 1) // 2 * 2
            cb2 = _pad_to(cb, H2, W2).reshape(H2 // 2, 2, W2 // 2, 2)
            cr2 = _pad_to(cr, H2, W2).reshape(H2 // 2, 2, W2 // 2, 2)
            planes = [y, cb2.mean(axis=(1, 3)), cr2.mean(axis=(1, 3))]
            factors = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            factors = [(1, 1)] * 3
    else:
        planes = [img[:, :, 0]]
        factors = [(1, 1)]
    planes = [np.clip(p, 0, 255) for p in planes]
    ql = _scaled_quant(_Q_LUMA, quality)
    qc = _scaled_quant(_Q_CHROMA, quality)
    quants = [ql] + [qc] * (len(planes) - 1)
    tids = [0] + [1] * (len(planes) - 1)

    hmax = max(f[0] for f in factors)
    vmax = max(f[1] for f in factors)
    mcux = (width + 8 * hmax - 1) // (8 * hmax)
    mcuy = (height + 8 * vmax - 1) // (8 * vmax)
    padded = [
        _pad_to(p, mcuy * fv * 8, mcux * fh * 8)
        for p, (fh, fv) in zip(planes, factors)
    ]

    w = _BitWriter()
    preds = [0] * len(planes)
    n_mcu = 0
    rst = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                w.flush()
                w.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(planes)
            for ci, (p, (fh, fv), q) in enumerate(
                zip(padded, factors, quants)
            ):
                for by in range(fv):
                    for bx in range(fh):
                        zz = _quantized_block(
                            p, (my * fv + by) * 8, (mx * fh + bx) * 8, q
                        )
                        preds[ci] = _entropy_encode(w, zz, preds[ci])
            n_mcu += 1
    w.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _dqt_seg(0, ql)
    if len(planes) > 1:
        out += _dqt_seg(1, qc)
    if restart_interval:
        out += _seg(0xDD, struct.pack(">H", restart_interval))
    sof = struct.pack(">BHHB", 8, height, width, len(planes))
    for cid, (tid, (fh, fv)) in enumerate(zip(tids, factors), start=1):
        sof += bytes([cid, (fh << 4) | fv, tid])
    out += _seg(0xC0, sof)
    out += _dht_seg(0, 0, _ENC_DC)
    out += _dht_seg(1, 0, _ENC_AC)
    sos = bytes([len(planes)])
    for cid in range(1, len(planes) + 1):
        sos += bytes([cid, 0x00])  # DC table 0, AC table 0
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    out += w.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------- decode


class _HuffDecoder:
    def __init__(self, bits: list[int], vals: list[int]) -> None:
        self.table = _canonical_codes(bits, vals)

    def decode(self, r: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | r.bit()
            v = self.table.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid JPEG Huffman code")


def decode_jpeg_raster(payload: bytes) -> tuple[bytes, int, int, int]:
    """Decode a baseline sequential JPEG into (8-bit raster bytes,
    width, height, n_channels) — RGB for 3-component YCbCr streams,
    grayscale for 1-component. Progressive/arithmetic/12-bit raise
    NotImplementedError; malformed streams raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    restart_interval = 0
    while pos < len(payload):
        if payload[pos] != 0xFF or pos + 1 >= len(payload):
            raise ValueError("marker expected in JPEG header walk")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        if pos + 4 > len(payload):
            raise ValueError("truncated JPEG segment header")
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        body = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (possibly several tables per seg)
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0x0F
                if prec != 0:
                    raise NotImplementedError("16-bit quant tables")
                zz = np.frombuffer(
                    body[i + 1 : i + 65], dtype=np.uint8
                ).astype(np.int64)
                q = np.zeros(64, dtype=np.int64)
                q[_ZIG_IDX] = zz
                quants[tid] = q.reshape(8, 8)
                i += 65
        elif marker == 0xC4:  # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0x0F
                bits = list(body[i + 1 : i + 17])
                n = sum(bits)
                vals = list(body[i + 17 : i + 17 + n])
                dec = _HuffDecoder(bits, vals)
                (huff_dc if cls == 0 else huff_ac)[tid] = dec
                i += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1: baseline
            prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"w": w_, "h": h, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential JPEG (SOF0/1) is supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = {}
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan[cid] = (tables >> 4, tables & 0x0F)
            return _decode_scan(
                payload, pos, frame, scan, quants, huff_dc, huff_ac,
                restart_interval,
            )
    raise ValueError("JPEG ended without SOS")


def _decode_scan(
    payload, pos, frame, scan, quants, huff_dc, huff_ac, restart_interval
):
    w_, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    mcux = (w_ + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    planes = []
    for c in comps:
        planes.append(
            np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        )
    r = _BitReader(payload, pos)
    preds = [0] * len(comps)
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if (
                restart_interval
                and n_mcu
                and n_mcu % restart_interval == 0
            ):
                if not r.at_restart():
                    raise ValueError("expected JPEG restart marker")
                r.restart()
                preds = [0] * len(comps)
            for ci, c in enumerate(comps):
                dct, act = scan[c["id"]]
                dc_dec, ac_dec = huff_dc[dct], huff_ac[act]
                quant = quants[c["tq"]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        size = dc_dec.decode(r)
                        if size > 11:
                            raise ValueError("invalid DC size category")
                        diff = _extend(r.bits(size), size)
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            sym = ac_dec.decode(r)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC run past block end")
                            zz[k] = _extend(r.bits(size), size)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[_ZIG_IDX] = zz * quant.flatten()[_ZIG_IDX]
                        block = _C.T @ coef.reshape(8, 8) @ _C + 128.0
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            n_mcu += 1
    # upsample chroma (nearest) to full resolution, crop padding
    full = []
    for c, p in zip(comps, planes):
        p = np.repeat(
            np.repeat(p, hmax // c["h"], axis=1), vmax // c["v"], axis=0
        )
        full.append(p[:h, :w_])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray.tobytes(), w_, h, 1
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    rgb = np.stack(
        [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
        axis=2,
    )
    return (
        np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes(),
        w_,
        h,
        3,
    )


def decode_jpeg(payload: bytes) -> tuple[list[float], int, int, int]:
    """decode_media-shaped wrapper: (flat samples in [0, 1], width,
    height, n_channels)."""
    raster, w, h, ch = decode_jpeg_raster(payload)
    return [b / 255.0 for b in raster], w, h, ch
