"""Baseline JPEG codec (ITU-T T.81 baseline sequential) in pure
numpy + stdlib — no imaging libraries.

Decoder: SOI/APPn/COM/DQT/DHT/DRI/SOF0/SOS marker walk, canonical
Huffman decode over the byte-stuffed entropy stream (0xFF00
unstuffing, RSTn restart handling), DC prediction, dequant, inverse
zigzag, orthonormal IDCT, YCbCr→RGB, sampling factors 1 and 2 per
axis (4:4:4 / 4:2:2 / 4:2:0; chroma upsampled nearest). Reads the
quant/Huffman tables FROM THE STREAM, so it decodes real-world
baseline files regardless of which tables they ship. Progressive
DCT (SOF2) decodes too (r11): spectral selection + successive
approximation per T.81 §G — DC first/refinement scans (interleaved
or not), AC band scans with EOBRUN/ZRL, AC refinement with
correction bits, restart handling per scan; coefficients accumulate
across scans and reconstruct once at EOI. 12-bit precision decodes
(r11 late): 16-bit DQT tables, DC size categories to 15, level shift
2^(prec-1), and the raster contract reduces samples by the exact
round(v·255/(2^prec−1)) — sequential AND progressive. Arithmetic
coding and hierarchical/lossless SOFs raise NotImplementedError
explicitly — the same honest-boundary contract as operators/png.py.

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
    """Decode a JPEG into (8-bit raster bytes, width, height,
    n_channels) — RGB for 3-component YCbCr streams, grayscale for
    1-component. Supported: baseline sequential (SOF0/1) and
    progressive (SOF2), at 8- and 12-bit sample precision
    (12-bit output is rescaled to 8-bit). Arithmetic-coded,
    hierarchical, and lossless frames raise NotImplementedError;
    malformed streams raise ValueError."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (bad SOI)")
    pos = 2
    quants: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffDecoder] = {}
    huff_ac: dict[int, _HuffDecoder] = {}
    frame = None
    progressive = False
    prog_scans = 0
    coeffs: dict[int, np.ndarray] | None = None
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
                if prec == 0:
                    zz = np.frombuffer(
                        body[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.int64)
                    i += 65
                else:  # Pq=1: 16-bit big-endian values (12-bit data)
                    zz = np.frombuffer(
                        body[i + 1 : i + 129], dtype=">u2"
                    ).astype(np.int64)
                    i += 129
                q = np.zeros(64, dtype=np.int64)
                q[_ZIG_IDX] = zz
                quants[tid] = q.reshape(8, 8)
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            prec, h, w_, nc = struct.unpack(">BHHB", body[:6])
            if prec not in (8, 12):
                raise NotImplementedError(f"{prec}-bit JPEG")
            comps = []
            for c in range(nc):
                cid, samp, tq = body[6 + 3 * c : 9 + 3 * c]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "tq": tq}
                )
            frame = {"w": w_, "h": h, "comps": comps, "prec": prec}
            progressive = marker == 0xC2
            if progressive:
                # zigzag-order coefficient store, MCU-padded grid so
                # interleaved and non-interleaved scans both index it
                grids, _, _, _, _ = _comp_grids(frame)
                coeffs = {
                    c["id"]: np.zeros(
                        (
                            grids[c["id"]]["bh"],
                            grids[c["id"]]["bw"],
                            64,
                        ),
                        dtype=np.int64,
                    )
                    for c in comps
                }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only baseline sequential (SOF0/1) and progressive "
                "(SOF2) JPEG are supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            if not progressive:
                scan = {}
                for c in range(ns):
                    cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                    scan[cid] = (tables >> 4, tables & 0x0F)
                return _decode_scan(
                    payload, pos, frame, scan, quants, huff_dc, huff_ac,
                    restart_interval,
                )
            # progressive: accumulate this scan, keep walking markers
            scan_list = []
            for c in range(ns):
                cid, tables = body[1 + 2 * c], body[2 + 2 * c]
                scan_list.append((cid, (tables >> 4, tables & 0x0F)))
            band = (
                body[1 + 2 * ns],
                body[2 + 2 * ns],
                body[3 + 2 * ns] >> 4,
                body[3 + 2 * ns] & 0x0F,
            )
            pos = _decode_progressive_scan(
                payload, pos, frame, scan_list, band, coeffs,
                huff_dc, huff_ac, restart_interval,
            )
            prog_scans += 1
    # A progressive frame that reached EOI without decoding any scan
    # must fail the same way a scanless baseline stream does — an
    # all-zero coefficient store would otherwise reconstruct to a
    # plausible-looking solid mid-gray raster.
    if progressive and frame is not None and prog_scans > 0:
        return _reconstruct_progressive(frame, coeffs, quants)
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
    prec = frame.get("prec", 8)
    half = float(1 << (prec - 1))
    k8 = 255.0 / ((1 << prec) - 1)
    max_dc_size = 11 if prec == 8 else 15
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
                        if size > max_dc_size:
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
                        block = (
                            _C.T @ coef.reshape(8, 8) @ _C + half
                        ) * k8
                        y0 = (my * c["v"] + by) * 8
                        x0 = (mx * c["h"] + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = block
            n_mcu += 1
    return _planes_to_raster(comps, planes, w_, h, hmax, vmax, half * k8)


def _planes_to_raster(comps, planes, w_, h, hmax, vmax, center):
    """Shared reconstruction tail: upsample chroma (nearest) to full
    resolution, crop padding, color-convert. `center` is the neutral
    chroma level AFTER the 8-bit rescale (half * k8): exactly 128.0
    at 8-bit precision, but ~127.53 at 12-bit (2048 * 255/4095) —
    subtracting a hardcoded 128 there would bias R/B by ~-0.7 on
    every pixel of a 12-bit color image."""
    full = []
    for c, p in zip(comps, planes):
        p = np.repeat(
            np.repeat(p, hmax // c["h"], axis=1), vmax // c["v"], axis=0
        )
        full.append(p[:h, :w_])
    if len(full) == 1:
        gray = np.clip(np.round(full[0]), 0, 255).astype(np.uint8)
        return gray.tobytes(), w_, h, 1
    y, cb, cr = full[0], full[1] - center, full[2] - center
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


# ----------------------------------------------------- progressive decode
#
# T.81 §G: progressive DCT decoding — spectral selection (each scan
# carries a zigzag coefficient band [Ss, Se]) and successive
# approximation (DC/AC first scans deliver coefficients at point
# transform Al; refinement scans append one magnitude bit per pass).
# The entropy machinery (_BitReader, _HuffDecoder, _extend) is shared
# with baseline; what changes is WHERE decoded values land — a
# per-component coefficient store that accumulates across scans and
# reconstructs once at EOI. Encoder support is deliberately absent
# (the repo's encoder stays baseline); conformance is tested against
# hand-assembled progressive streams decoded next to their baseline
# equivalents (tests/test_jpeg_progressive.py).


def _comp_grids(frame):
    """Per-component block-grid geometry: the INTERLEAVED grid
    (mcu-padded, what DC interleaved scans walk) and the
    non-interleaved grid (ceil(comp_dim/8), what single-component
    scans walk — §G.1, same rule as sequential non-interleaved)."""
    w_, h = frame["w"], frame["h"]
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise NotImplementedError("sampling factors beyond 2 unsupported")
    mcux = (w_ + 8 * hmax - 1) // (8 * hmax)
    mcuy = (h + 8 * vmax - 1) // (8 * vmax)
    grids = {}
    for c in comps:
        cw = (w_ * c["h"] + hmax - 1) // hmax
        ch = (h * c["v"] + vmax - 1) // vmax
        grids[c["id"]] = {
            "bw": mcux * c["h"],
            "bh": mcuy * c["v"],
            "bw_full": (cw + 7) // 8,
            "bh_full": (ch + 7) // 8,
        }
    return grids, mcux, mcuy, hmax, vmax


def _decode_progressive_scan(
    payload, pos, frame, scan, band, coeffs, huff_dc, huff_ac,
    restart_interval,
):
    """Decode ONE progressive scan into the coefficient store;
    returns the stream position of the next marker. ``scan`` is the
    SOS component list [(cid, (td, ta)), ...]; ``band`` is
    (Ss, Se, Ah, Al)."""
    ss, se, ah, al = band
    grids, mcux, mcuy, _, _ = _comp_grids(frame)
    by_id = {c["id"]: c for c in frame["comps"]}
    comps = [by_id[cid] for cid, _ in scan]
    tabs = dict(scan)
    r = _BitReader(payload, pos)
    eobrun = 0
    preds = {c["id"]: 0 for c in comps}
    p1 = 1 << al

    def check_restart(n_units):
        nonlocal eobrun
        if restart_interval and n_units and n_units % restart_interval == 0:
            if not r.at_restart():
                raise ValueError("expected JPEG restart marker")
            r.restart()
            eobrun = 0
            for k in preds:
                preds[k] = 0

    def refine_one(blk, k) -> None:
        # append this scan's magnitude bit to an already-nonzero
        # coefficient (G.1.2.3); conformant history makes the
        # magnitude test equivalent to libjpeg's two's-complement one
        if r.bit() and (abs(blk[k]) & p1) == 0:
            blk[k] += p1 if blk[k] > 0 else -p1

    if ss == 0:  # DC scan (first or refinement); Se must be 0
        if se != 0:
            raise ValueError("progressive DC scan with Se != 0")

        max_dc_size = 11 if frame.get("prec", 8) == 8 else 15

        def dc_block(c, by, bx):
            blk = coeffs[c["id"]][by, bx]
            if ah == 0:
                size = huff_dc[tabs[c["id"]][0]].decode(r)
                if size > max_dc_size:
                    raise ValueError("invalid DC size category")
                preds[c["id"]] += _extend(r.bits(size), size)
                blk[0] = preds[c["id"]] << al
            else:
                if r.bit():
                    blk[0] = int(blk[0]) | p1

        if len(comps) > 1:  # interleaved MCU walk
            n_mcu = 0
            for my in range(mcuy):
                for mx in range(mcux):
                    check_restart(n_mcu)
                    for c in comps:
                        for by in range(c["v"]):
                            for bx in range(c["h"]):
                                dc_block(
                                    c, my * c["v"] + by, mx * c["h"] + bx
                                )
                    n_mcu += 1
        else:
            c = comps[0]
            g = grids[c["id"]]
            n = 0
            for by in range(g["bh_full"]):
                for bx in range(g["bw_full"]):
                    check_restart(n)
                    dc_block(c, by, bx)
                    n += 1
    else:  # AC scan: exactly one component (G.1.1.1.1)
        if len(comps) != 1:
            raise ValueError("progressive AC scan must be single-component")
        c = comps[0]
        g = grids[c["id"]]
        ac = huff_ac[tabs[c["id"]][1]]
        n = 0
        for by in range(g["bh_full"]):
            for bx in range(g["bw_full"]):
                check_restart(n)
                n += 1
                blk = coeffs[c["id"]][by, bx]
                if ah == 0:  # first scan for this band
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = ac.decode(r)
                        run, size = sym >> 4, sym & 0x0F
                        if size == 0:
                            if run == 15:
                                k += 16  # ZRL
                                continue
                            eobrun = (1 << run) - 1
                            if run:
                                eobrun += r.bits(run)
                            break
                        k += run
                        if k > se:
                            raise ValueError("AC run past band end")
                        blk[k] = _extend(r.bits(size), size) << al
                        k += 1
                else:  # refinement
                    k = ss
                    if eobrun == 0:
                        while k <= se:
                            sym = ac.decode(r)
                            run, size = sym >> 4, sym & 0x0F
                            newval = 0
                            if size == 0:
                                if run != 15:
                                    eobrun = 1 << run
                                    if run:
                                        eobrun += r.bits(run)
                                    break  # EOB correction below
                            else:
                                if size != 1:
                                    raise ValueError(
                                        "AC refinement size must be 1"
                                    )
                                newval = p1 if r.bit() else -p1
                            # advance: correction bits over nonzero
                            # history, counting `run` zero-history
                            # slots (ZRL counts 16, value codes `run`)
                            while k <= se:
                                if blk[k] != 0:
                                    refine_one(blk, k)
                                else:
                                    if run == 0:
                                        break
                                    run -= 1
                                k += 1
                            if newval:
                                if k > se:
                                    raise ValueError(
                                        "AC refinement past band end"
                                    )
                                blk[k] = newval
                            k += 1
                    if eobrun > 0:
                        while k <= se:
                            if blk[k] != 0:
                                refine_one(blk, k)
                            k += 1
                        eobrun -= 1
    # skip byte-align padding / stray fill to the next marker
    p = r.pos
    while p + 1 < len(payload) and not (
        payload[p] == 0xFF and payload[p + 1] != 0x00
    ):
        p += 1
    return p


def _reconstruct_progressive(frame, coeffs, quants):
    """Dequantize + IDCT the accumulated coefficient store (whole
    component at once — one einsum per plane) and run the shared
    reconstruction tail."""
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    prec = frame.get("prec", 8)
    half = float(1 << (prec - 1))
    k8 = 255.0 / ((1 << prec) - 1)
    planes = []
    for c in comps:
        zz = coeffs[c["id"]].astype(np.float64)  # (bh, bw, 64) zigzag
        quant_zz = quants[c["tq"]].flatten()[_ZIG_IDX].astype(np.float64)
        nat = np.zeros_like(zz)
        nat[:, :, _ZIG_IDX] = zz * quant_zz
        bh, bw = nat.shape[0], nat.shape[1]
        blocks = nat.reshape(bh, bw, 8, 8)
        idct = (
            np.einsum("ij,bcjk,kl->bcil", _C.T, blocks, _C) + half
        ) * k8
        planes.append(idct.transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
    return _planes_to_raster(
        comps, planes, frame["w"], frame["h"], hmax, vmax, half * k8
    )
