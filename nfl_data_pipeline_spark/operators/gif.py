"""GIF87a/89a codec in pure stdlib — including ANIMATED GIFs, which
makes this the one format where ``frame_sample`` gets real
multi-frame visual decoding natively (video codecs stay behind the
deployment boundary).

Decoder: logical screen descriptor, global/local color tables, full
LZW decompression (variable code width, clear/EOI codes, code-table
growth to 12 bits), graphic-control extensions (frame delay,
transparency, disposal methods none/keep/background/previous),
4-pass interlace reorder, frame composition onto the logical canvas.
Returns full-canvas RGB frames with their delays — the shape a
frame-sampling stage wants.

Encoder: real LZW (not the clear-code-spam degenerate form), exact
palette when the image has ≤256 distinct colors, else a deterministic
uniform 6×7×6 cube quantization (documented lossy fallback — this
repo does not chase dithering quality). Multi-frame input becomes an
animated GIF with per-frame delays, which is what the frame-sample
tests roundtrip.
"""

from __future__ import annotations

import struct

_HDR87 = b"GIF87a"
_HDR89 = b"GIF89a"


# ----------------------------------------------------------------- LZW


def _lzw_decode(mcs: int, data: bytes) -> list[int]:
    """GIF-flavor LZW: variable code width starting at mcs+1, CLEAR
    resets the table, EOI ends the stream."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    codes: dict[int, tuple] = {}

    def reset():
        nonlocal codes, width, nxt
        codes = {i: (i,) for i in range(clear)}
        width = mcs + 1
        nxt = eoi + 1

    width = mcs + 1
    nxt = eoi + 1
    reset()
    out: list[int] = []
    acc = n = 0
    prev: tuple | None = None
    for byte in data:
        acc |= byte << n
        n += 8
        while n >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            n -= width
            if code == clear:
                reset()
                prev = None
                continue
            if code == eoi:
                return out
            if prev is None:
                entry = codes[code]
            elif code in codes:
                entry = codes[code]
                codes[nxt] = prev + (entry[0],)
                nxt += 1
            elif code == nxt:  # the KwKwK case
                entry = prev + (prev[0],)
                codes[nxt] = entry
                nxt += 1
            else:
                raise ValueError("corrupt GIF LZW stream")
            out.extend(entry)
            prev = entry
            if nxt == (1 << width) and width < 12:
                width += 1
    return out


def _lzw_encode(mcs: int, indices: list[int]) -> bytes:
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    table = {(i,): i for i in range(clear)}
    width = mcs + 1
    nxt = eoi + 1
    out = bytearray()
    acc = n = 0

    def emit(code: int) -> None:
        nonlocal acc, n
        acc |= code << n
        n += width
        while n >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            n -= 8

    emit(clear)
    buf: tuple = ()
    for ix in indices:
        cand = buf + (ix,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf])
        table[cand] = nxt
        nxt += 1
        if nxt - 1 == (1 << width) and width < 12:
            width += 1
        if nxt >= (1 << 12):
            emit(clear)
            table = {(i,): i for i in range(clear)}
            width = mcs + 1
            nxt = eoi + 1
        buf = (ix,)
    if buf:
        emit(table[buf])
    emit(eoi)
    if n:
        out.append(acc & 0xFF)
    return bytes(out)


# -------------------------------------------------------------- decode


def _subblocks(payload: bytes, pos: int) -> tuple[bytes, int]:
    chunks = bytearray()
    while True:
        if pos >= len(payload):
            raise ValueError("truncated GIF sub-blocks")
        ln = payload[pos]
        pos += 1
        if ln == 0:
            return bytes(chunks), pos
        chunks += payload[pos : pos + ln]
        pos += ln
    # unreachable


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frames(
    payload: bytes,
) -> tuple[list[tuple[int, bytes]], int, int]:
    """Decode every frame of a (possibly animated) GIF, composed onto
    the logical canvas with disposal/transparency honored. Returns
    ([(delay_ms, rgb_raster_bytes)], width, height) — each raster is
    the FULL canvas after the frame renders, row-major RGB."""
    if payload[:6] not in (_HDR87, _HDR89):
        raise ValueError("not a GIF (bad signature)")
    W, H, packed, bg, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = payload[pos : pos + 3 * n]
        pos += 3 * n
    canvas = bytearray(3 * W * H)
    if gct and 3 * bg + 3 <= len(gct):
        bgc = gct[3 * bg : 3 * bg + 3]
        for i in range(W * H):
            canvas[3 * i : 3 * i + 3] = bgc
    frames: list[tuple[int, bytes]] = []
    delay_ms = 0
    transparent: int | None = None
    disposal = 0
    prev_canvas: bytes | None = None
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            label = payload[pos]
            pos += 1
            data, pos = _subblocks(payload, pos)
            if label == 0xF9 and len(data) >= 4:
                flags, delay_cs, tix = struct.unpack("<BHB", data[:4])
                disposal = (flags >> 2) & 0x07
                transparent = tix if flags & 0x01 else None
                delay_ms = delay_cs * 10
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
        left, top, fw, fh, fpacked = struct.unpack(
            "<HHHHB", payload[pos : pos + 9]
        )
        pos += 9
        lct = None
        if fpacked & 0x80:
            n = 2 << (fpacked & 0x07)
            lct = payload[pos : pos + 3 * n]
            pos += 3 * n
        ctable = lct or gct
        if ctable is None:
            raise ValueError("GIF frame without a color table")
        mcs = payload[pos]
        pos += 1
        data, pos = _subblocks(payload, pos)
        indices = _lzw_decode(mcs, data)
        if len(indices) < fw * fh:
            raise ValueError("GIF frame under-decoded")
        if fpacked & 0x40:  # interlaced: reorder rows
            rows = [indices[r * fw : (r + 1) * fw] for r in range(fh)]
            ordered: list = [None] * fh
            src = 0
            for start, step in _INTERLACE_PASSES:
                for r in range(start, fh, step):
                    ordered[r] = rows[src]
                    src += 1
            indices = [ix for row in ordered for ix in row]
        if disposal == 3:
            prev_canvas = bytes(canvas)
        before_bg = bytes(canvas) if disposal == 2 else None
        for r in range(fh):
            cy = top + r
            if cy >= H:
                continue
            for c in range(fw):
                cx = left + c
                if cx >= W:
                    continue
                ix = indices[r * fw + c]
                if ix == transparent:
                    continue
                off = 3 * ix
                if off + 3 > len(ctable):
                    raise ValueError("GIF color index out of range")
                canvas[3 * (cy * W + cx) : 3 * (cy * W + cx) + 3] = (
                    ctable[off : off + 3]
                )
        frames.append((delay_ms, bytes(canvas)))
        # disposal AFTER the frame is rendered/captured
        if disposal == 2 and before_bg is not None and gct is not None:
            bgc = gct[3 * bg : 3 * bg + 3]
            for r in range(fh):
                cy = top + r
                if cy >= H:
                    continue
                for c in range(fw):
                    cx = left + c
                    if cx >= W:
                        continue
                    canvas[3 * (cy * W + cx) : 3 * (cy * W + cx) + 3] = bgc
        elif disposal == 3 and prev_canvas is not None:
            canvas = bytearray(prev_canvas)
        # GIF89a: a Graphic Control Extension applies ONLY to the
        # first following rendering block — a frame without its own
        # GCE must not inherit the previous frame's transparency
        # index / disposal / delay (ADVICE r10)
        delay_ms = 0
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF contained no image frames")
    return frames, W, H


def decode_gif(payload: bytes) -> tuple[list[float], int, int, int]:
    """decode_media-shaped wrapper: the FIRST frame as flat samples in
    [0, 1] (animated payloads expose every frame via
    ``decode_gif_frames`` / frame_sample)."""
    frames, w, h = decode_gif_frames(payload)
    return [b / 255.0 for b in frames[0][1]], w, h, 3


# -------------------------------------------------------------- encode


def _quantize(raster: bytes) -> tuple[list[int], bytes]:
    """(palette indices, color table bytes): exact palette when ≤256
    distinct colors, else deterministic uniform 6×7×6 quantization."""
    pixels = [raster[i : i + 3] for i in range(0, len(raster), 3)]
    uniq = sorted(set(pixels))
    if len(uniq) <= 256:
        lut = {c: i for i, c in enumerate(uniq)}
        table = b"".join(uniq)
        return [lut[p] for p in pixels], table
    # 6 levels R, 7 G, 6 B = 252 cells
    table = bytearray()
    for r in range(6):
        for g in range(7):
            for b in range(6):
                table += bytes(
                    (min(255, r * 51), min(255, g * 43), min(255, b * 51))
                )
    idx = [
        (min(5, p[0] // 43)) * 42 + (min(6, p[1] // 37)) * 6 + min(5, p[2] // 43)
        for p in pixels
    ]
    return idx, bytes(table)


def encode_gif(
    frames: list[bytes],
    width: int,
    height: int,
    delays_ms: list[int] | None = None,
) -> bytes:
    """Encode RGB rasters as a GIF (animated when len(frames) > 1),
    one shared palette built from the first frame's quantization of
    the CONCATENATED frames so every frame indexes one table."""
    if not frames:
        raise ValueError("no frames to encode")
    for f in frames:
        if len(f) != 3 * width * height:
            raise ValueError("frame size mismatch")
    delays_ms = delays_ms or [100] * len(frames)
    all_idx, table = _quantize(b"".join(frames))
    n_pix = width * height
    # pad color table to a power of two ≥ 4 entries
    n_colors = max(4, 1 << (max(len(table) // 3, 2) - 1).bit_length())
    table = table + bytes(3 * (n_colors - len(table) // 3))
    size_field = n_colors.bit_length() - 2  # 2^(field+1) entries
    out = bytearray(_HDR89)
    out += struct.pack("<HHBBB", width, height, 0x80 | size_field, 0, 0)
    out += table
    # animation loop extension (Netscape) when multi-frame
    if len(frames) > 1:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    mcs = max(2, (n_colors - 1).bit_length())
    for fi in range(len(frames)):
        out += b"\x21\xf9\x04"
        # GCE delay is centiseconds: round, and clamp NONZERO delays
        # to ≥1 cs — flooring a 1-9 ms request to 0 silently drops
        # the author's timing intent (ADVICE r10)
        d_cs = round(delays_ms[fi] / 10) if delays_ms[fi] else 0
        if delays_ms[fi] and d_cs == 0:
            d_cs = 1
        out += struct.pack("<BHB", 0x00, d_cs, 0)
        out += b"\x00"
        out += b"\x2c" + struct.pack("<HHHHB", 0, 0, width, height, 0)
        out += bytes([mcs])
        payload = _lzw_encode(
            mcs, all_idx[fi * n_pix : (fi + 1) * n_pix]
        )
        for i in range(0, len(payload), 255):
            chunk = payload[i : i + 255]
            out += bytes([len(chunk)]) + chunk
        out += b"\x00"
    out += b"\x3b"
    return bytes(out)
