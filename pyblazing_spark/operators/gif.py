"""GIF87a/89a codec in pure Python/numpy — including the LZW entropy
coder, which the stdlib does not ship (zlib is DEFLATE, not LZW).

Implements the real on-disk format: logical screen descriptor, global
color table, image descriptor, GIF-variant LZW (variable code width
3..12 bits, clear/EOI codes, dictionary reset), data sub-block framing,
and trailer. Encoding is lossless for images with <= 256 distinct
colors (the format's own limit): palette = first-occurrence order of
unique pixels, so decode(encode(x)) == x byte-for-byte and catalog
oracles can check md5-exact equality like the PNG path.

Kernels in :mod:`pyblazing_spark.operators.multimodal` route ``GIF8``
buffers here via the signature sniff."""

from __future__ import annotations

import struct

import numpy as np

GIF_SIG = b"GIF8"


def _lzw_encode(indices: list[int], mcs: int) -> bytes:
    """GIF-variant LZW: emit CLEAR, then greedy longest-match codes with
    a growing dictionary (reset at 4096), then EOI."""
    clear = 1 << mcs
    eoi = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits  # LSB-first packing
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table = {(i,): i for i in range(clear)}
    next_code = eoi + 1
    width = mcs + 1
    emit(clear, width)
    buf: tuple[int, ...] = ()
    for px in indices:
        cand = buf + (px,)
        if cand in table:
            buf = cand
            continue
        emit(table[buf], width)
        table[cand] = next_code
        next_code += 1
        if next_code > (1 << width) and width < 12:
            width += 1
        elif next_code >= 4096:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            next_code = eoi + 1
            width = mcs + 1
        buf = (px,)
    if buf:
        emit(table[buf], width)
    emit(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(data: bytes, mcs: int, n_pixels: int) -> list[int]:
    clear = 1 << mcs
    eoi = clear + 1
    pos = 0
    acc = 0
    nbits = 0

    def read(width: int) -> int:
        nonlocal pos, acc, nbits
        while nbits < width:
            if pos >= len(data):
                return eoi  # truncated stream: stop
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        v = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        return v

    out: list[int] = []
    table: list[tuple[int, ...]] = []
    width = mcs + 1
    prev: tuple[int, ...] | None = None

    def reset() -> None:
        nonlocal table, width, prev
        table = [(i,) for i in range(clear)] + [(), ()]
        width = mcs + 1
        prev = None

    reset()
    while len(out) < n_pixels:
        code = read(width)
        if code == clear:
            reset()
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + (entry[0],))
        elif code == len(table):  # the KwKwK special case
            entry = prev + (prev[0],)
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW stream")
        out.extend(entry)
        prev = entry
        # width grows when the NEXT code would not fit
        if len(table) >= (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


def encode_gif(width: int, height: int, rgb: bytes) -> bytes:
    """GIF89a from raw RGB; lossless iff the image has <= 256 distinct
    colors (raises otherwise — that is the format's own constraint)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != w*h*3")
    px = np.frombuffer(rgb, np.uint8).reshape(-1, 3)
    colors, inverse = np.unique(px, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError(
            f"GIF supports <= 256 colors; image has {len(colors)}"
        )
    # palette size = next power of two >= n_colors (min 2)
    n_pal = 2
    while n_pal < len(colors):
        n_pal *= 2
    pal_bits = n_pal.bit_length() - 1  # log2
    palette = np.zeros((n_pal, 3), np.uint8)
    palette[: len(colors)] = colors
    mcs = max(2, pal_bits)  # LZW min code size (spec: >= 2)

    out = bytearray(b"GIF89a")
    # logical screen descriptor: global table present, size field
    flags = 0x80 | (pal_bits - 1 if pal_bits else 0)
    out += struct.pack("<HHBBB", width, height, flags, 0, 0)
    out += palette.tobytes()
    out += struct.pack("<BHHHHB", 0x2C, 0, 0, width, height, 0)  # image desc
    out.append(mcs)
    compressed = _lzw_encode([int(i) for i in inverse], mcs)
    for i in range(0, len(compressed), 255):
        block = compressed[i : i + 255]
        out.append(len(block))
        out += block
    out.append(0)  # block terminator
    out.append(0x3B)  # trailer
    return bytes(out)


def decode_gif(data: bytes) -> tuple[int, int, bytes]:
    """(width, height, rgb) from a GIF87a/89a buffer (first image frame;
    global or local color table; interlaced or sequential)."""
    if data[:4] != GIF_SIG or data[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    palette = None
    if flags & 0x80:
        n_pal = 2 << (flags & 0x07)
        palette = np.frombuffer(data[pos : pos + n_pal * 3], np.uint8).reshape(
            -1, 3
        )
        pos += n_pal * 3
    while pos < len(data):
        block = data[pos]
        if block == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif block == 0x2C:  # image descriptor
            _x, _y, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            interlaced = bool(iflags & 0x40)
            if iflags & 0x80:  # local color table
                n_pal = 2 << (iflags & 0x07)
                palette = np.frombuffer(
                    data[pos : pos + n_pal * 3], np.uint8
                ).reshape(-1, 3)
                pos += n_pal * 3
            if palette is None:
                raise ValueError("GIF image has no color table")
            mcs = data[pos]
            pos += 1
            compressed = bytearray()
            while data[pos] != 0:
                n = data[pos]
                compressed += data[pos + 1 : pos + 1 + n]
                pos += 1 + n
            indices = _lzw_decode(bytes(compressed), mcs, w * h)
            rgb = palette[np.array(indices, np.int32)].astype(np.uint8)
            if interlaced:
                # GIF89a appendix E: rows are stored in four passes
                # (every 8th from 0, every 8th from 4, every 4th from 2,
                # every 2nd from 1) — deinterlacing is a pure row
                # permutation after LZW decode.
                order = (
                    list(range(0, h, 8))
                    + list(range(4, h, 8))
                    + list(range(2, h, 4))
                    + list(range(1, h, 2))
                )
                rows = rgb.reshape(h, w, 3)
                out = np.empty_like(rows)
                out[order] = rows
                rgb = out
            return w, h, rgb.tobytes()
        elif block == 0x3B:
            break
        else:
            raise ValueError(f"unknown GIF block 0x{block:02x}")
    raise ValueError("GIF contains no image data")
