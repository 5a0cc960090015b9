"""Pure-stdlib PNG codec (zlib + struct — no image libraries).

PNG's container is DEFLATE (stdlib ``zlib``) around per-scanline
byte filters (ISO/IEC 15948 / RFC 2083), so a complete, honest
decoder for the FULL profile matrix needs no third-party code:
every legal bit depth (1/2/4-bit gray and palette unpack MSB-first,
gray scaling v·255/(2^d−1); 16-bit reduces to the 8-bit raster
contract by exact round(v/257)), color types 0 (gray), 2 (RGB), 3
(palette), 4 (gray+alpha), 6 (RGBA), non-interlaced or
Adam7-interlaced (r11). Spec-invalid combinations (16-bit palette,
sub-byte truecolor) raise ValueError; there is no remaining
NotImplementedError surface in PNG decode.

The encoder writes any of the five standard filters (None/Sub/Up/
Average/Paeth), which is what lets the tests prove the decoder's
unfilter paths against real encoded bytes instead of fixtures.

Scale note: these run inside Arrow-batched ``mapInPandas`` stages
(operators/multimodal.py) — per-row Python is the accepted cost of a
codec; the Spark-side plumbing keeps batches bounded and decodes
only rows whose metadata survives pruning.
"""

from __future__ import annotations

import struct
import zlib

_SIG = b"\x89PNG\r\n\x1a\n"
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
#: Adam7 pass geometry: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _chunks(payload: bytes):
    if payload[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    i = 8
    while i + 8 <= len(payload):
        (ln,) = struct.unpack(">I", payload[i : i + 4])
        typ = payload[i + 4 : i + 8]
        data = payload[i + 8 : i + 8 + ln]
        if i + 12 + ln > len(payload):
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack(">I", payload[i + 8 + ln : i + 12 + ln])
        if zlib.crc32(typ + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk CRC mismatch in {typ!r}")
        yield typ, data
        i += 12 + ln
        if typ == b"IEND":
            return
    raise ValueError("PNG ended without IEND")


def _unfilter(
    raw: bytes, width: int, height: int, bpp: int, stride: int | None = None
) -> bytearray:
    # ``stride`` overrides the full-byte width*bpp row length for
    # sub-byte depths, where a row is ceil(width·depth/8) bytes and
    # the filter distance bpp is one byte (spec 9.2)
    stride = width * bpp if stride is None else stride
    if len(raw) < height * (stride + 1):
        raise ValueError("truncated PNG raster")
    out = bytearray(height * stride)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        line = raw[pos + 1 : pos + 1 + stride]
        pos += 1 + stride
        row0 = y * stride
        prow = row0 - stride
        if ftype == 0:  # None
            out[row0 : row0 + stride] = line
        elif ftype == 1:  # Sub
            for x in range(stride):
                left = out[row0 + x - bpp] if x >= bpp else 0
                out[row0 + x] = (line[x] + left) & 0xFF
        elif ftype == 2:  # Up
            if y == 0:
                out[row0 : row0 + stride] = line
            else:
                for x in range(stride):
                    out[row0 + x] = (line[x] + out[prow + x]) & 0xFF
        elif ftype == 3:  # Average
            for x in range(stride):
                left = out[row0 + x - bpp] if x >= bpp else 0
                up = out[prow + x] if y else 0
                out[row0 + x] = (line[x] + (left + up) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = out[row0 + x - bpp] if x >= bpp else 0
                up = out[prow + x] if y else 0
                ul = out[prow + x - bpp] if (y and x >= bpp) else 0
                out[row0 + x] = (line[x] + _paeth(left, up, ul)) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out


def _expand_subbyte(
    row: bytes, width: int, depth: int, scale: bool
) -> bytearray:
    """Unpack ``width`` MSB-first samples from a packed sub-byte row;
    gray samples scale to 8-bit (v·255/(2^d−1), exact for the
    standard depths), palette indices pass through unscaled."""
    out = bytearray(width)
    mask = (1 << depth) - 1
    per = 8 // depth
    for x in range(width):
        v = (row[x // per] >> (8 - depth * (x % per + 1))) & mask
        out[x] = v * 255 // mask if scale else v
    return out


def _decode_subimage(
    raw: bytes, w: int, h: int, color: int, depth: int
) -> tuple[bytearray, int, int]:
    """Unfilter (and for sub-byte depths, unpack) one (sub)image.
    Returns (pixels at bpp_out bytes per pixel, bytes consumed from
    ``raw``, bpp_out)."""
    ch = _CHANNELS[color]
    if depth < 8:
        stride = (w * depth + 7) // 8
        filt = _unfilter(raw, w, h, 1, stride=stride)
        out = bytearray()
        for y in range(h):
            out += _expand_subbyte(
                filt[y * stride : (y + 1) * stride], w, depth, color == 0
            )
        return out, h * (stride + 1), 1
    bpp = ch * (2 if depth == 16 else 1)
    return _unfilter(raw, w, h, bpp), h * (w * bpp + 1), bpp


def _deinterlace(
    data: bytes, width: int, height: int, color: int, depth: int,
    interlace: int,
) -> bytearray:
    """Assemble the full raster from the decompressed stream —
    either one sequential image or the seven Adam7 reduced images,
    each independently filtered (and bit-packed at sub-byte depths,
    per pass, rows padded to byte boundaries)."""
    if interlace == 0:
        out, _, _ = _decode_subimage(data, width, height, color, depth)
        return out
    bpp_out = 1 if depth < 8 else _CHANNELS[color] * (
        2 if depth == 16 else 1
    )
    raster = bytearray(width * height * bpp_out)
    pos = 0
    for x0, y0, xs, ys in _ADAM7:
        pw = (width - x0 + xs - 1) // xs
        ph = (height - y0 + ys - 1) // ys
        if pw <= 0 or ph <= 0:
            continue
        sub, used, _ = _decode_subimage(
            data[pos:], pw, ph, color, depth
        )
        pos += used
        for ry in range(ph):
            for rx in range(pw):
                dst = ((y0 + ry * ys) * width + (x0 + rx * xs)) * bpp_out
                src = (ry * pw + rx) * bpp_out
                raster[dst : dst + bpp_out] = sub[src : src + bpp_out]
    return raster


def decode_png_raster(payload: bytes) -> tuple[bytes, int, int, int]:
    """Decode a PNG into (8-bit raster bytes, width, height,
    n_channels) — row-major, samples interleaved. Palette images
    expand to RGB (3 channels). Supported profile: every legal
    (depth, color type, interlace) combination of the spec —
    1/2/4/8/16-bit, color types 0/2/3/4/6, sequential or Adam7."""
    width = height = None
    color = bitdepth = interlace = None
    palette: bytes | None = None
    idat = bytearray()
    for typ, data in _chunks(payload):
        if typ == b"IHDR":
            width, height, bitdepth, color, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", data)
            )
            if comp != 0 or filt != 0:
                raise ValueError("nonstandard PNG compression/filter")
        elif typ == b"PLTE":
            palette = bytes(data)
        elif typ == b"IDAT":
            idat.extend(data)
    if width is None:
        raise ValueError("PNG missing IHDR")
    if interlace not in (0, 1):
        raise ValueError(f"invalid PNG interlace method {interlace}")
    if bitdepth not in (1, 2, 4, 8, 16):
        raise ValueError(f"invalid PNG bit depth {bitdepth}")
    if color not in _CHANNELS:
        raise NotImplementedError(f"PNG color type {color} not supported")
    if bitdepth < 8 and color not in (0, 3):
        raise ValueError(
            f"sub-byte depth {bitdepth} is only valid for gray/palette"
            " (spec 11.2.2)"
        )
    if color == 3 and bitdepth == 16:
        raise ValueError("palette PNG cannot be 16-bit (spec 11.2.2)")
    data = zlib.decompress(bytes(idat))
    raster = _deinterlace(data, width, height, color, bitdepth, interlace)
    if bitdepth == 16:
        # reduce to the 8-bit raster contract: round(v / 257) maps
        # 0→0 and 65535→255 exactly (v = s·257 round-trips s)
        out = bytearray(len(raster) // 2)
        for i in range(0, len(raster), 2):
            out[i // 2] = ((raster[i] << 8 | raster[i + 1]) + 128) // 257
        raster = out
    if color == 3:
        if palette is None:
            raise ValueError("palette PNG missing PLTE")
        rgb = bytearray(len(raster) * 3)
        for i, ix in enumerate(raster):
            off = 3 * ix
            if off + 3 > len(palette):
                raise ValueError("palette index out of range")
            rgb[3 * i : 3 * i + 3] = palette[off : off + 3]
        return bytes(rgb), width, height, 3
    return bytes(raster), width, height, _CHANNELS[color]


def decode_png(payload: bytes) -> tuple[list[float], int, int, int]:
    """Decode a PNG into (flat samples normalized to [0, 1], width,
    height, n_channels) — the decode_media signal shape. Same
    supported profile as ``decode_png_raster``."""
    raster, width, height, ch = decode_png_raster(payload)
    return [b / 255.0 for b in raster], width, height, ch


def _filter_line(
    line: bytes, prev: bytes | None, bpp: int, ftype: int
) -> bytes:
    n = len(line)
    up = prev if prev is not None else bytes(n)
    out = bytearray(n)
    for x in range(n):
        left = line[x - bpp] if x >= bpp else 0
        ul = up[x - bpp] if x >= bpp else 0
        if ftype == 0:
            v = line[x]
        elif ftype == 1:
            v = line[x] - left
        elif ftype == 2:
            v = line[x] - up[x]
        elif ftype == 3:
            v = line[x] - (left + up[x]) // 2
        elif ftype == 4:
            v = line[x] - _paeth(left, up[x], ul)
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        out[x] = v & 0xFF
    return bytes(out)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def encode_png(
    raster: bytes,
    width: int,
    height: int,
    channels: int = 3,
    filter_type: int = 0,
) -> bytes:
    """Encode an 8-bit raster (row-major, ``channels`` interleaved
    samples per pixel) as a PNG, using the given scanline filter for
    every row (0=None 1=Sub 2=Up 3=Average 4=Paeth — all five are
    valid PNG; exposing the choice lets tests drive every decoder
    unfilter path with real encoded bytes)."""
    color = {1: 0, 2: 4, 3: 2, 4: 6}.get(channels)
    if color is None:
        raise ValueError(f"unsupported channel count {channels}")
    stride = width * channels
    if len(raster) != height * stride:
        raise ValueError(
            f"raster is {len(raster)} bytes, need {height * stride}"
        )
    lines = bytearray()
    prev: bytes | None = None
    for y in range(height):
        line = raster[y * stride : (y + 1) * stride]
        lines.append(filter_type)
        lines.extend(_filter_line(line, prev, channels, filter_type))
        prev = line
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _chunk(b"IEND", b"")
    )
