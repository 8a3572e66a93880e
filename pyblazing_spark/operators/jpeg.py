"""Baseline JFIF (JPEG) codec in pure numpy + stdlib — no codec library.

Implements the ITU-T.81 baseline sequential DCT process: 8x8 block DCT,
uniform quantization (Annex K tables, quality-scaled per the IJG rule),
zigzag ordering, differential DC + run-length AC coding with the spec's
Annex K "typical" Huffman tables, JFIF marker framing, and the inverse
of all of the above. Encoder emits 4:4:4 (no chroma subsampling);
decoder handles component sampling factors of 1 or 2 in each axis
(i.e. 4:4:4, 4:2:2, 4:2:0) for grayscale and YCbCr images.

This closes the "real compressed-codec decode" gap for JPEG the same
way PNG was closed with stdlib zlib: the bit-level entropy coding,
block transform, and color model are all genuinely implemented and
unit-tested (roundtrip PSNR, DC-only exactness, marker framing).
JPEG is lossy by design, so roundtrips are verified by PSNR, not
byte equality.

Kernels in :mod:`pyblazing_spark.operators.multimodal` route ``.jpg``
buffers here via the FFD8 signature sniff.
"""

from __future__ import annotations

import struct

import numpy as np

JPEG_SIG = b"\xff\xd8"

# ---------------------------------------------------------------- tables
#: Annex K.1 luminance / K.2 chrominance base quantization tables.
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int32).reshape(8, 8)

QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int32).reshape(8, 8)

#: zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient.
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
    )
    return np.array(order, dtype=np.int32)

ZIGZAG = _zigzag_order()
#: flat index (r*8+c) per zigzag position, and its inverse.
ZZ_FLAT = ZIGZAG[:, 0] * 8 + ZIGZAG[:, 1]
UNZZ = np.argsort(ZZ_FLAT)

# Annex K.3 "typical" Huffman tables: (bits counts per length 1..16, values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _huff_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per the canonical JPEG code assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _huff_lookup(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value, for the decoder."""
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


#: DCT-II orthonormal basis matrix: block_dct = D @ B @ D.T
def _dct_matrix() -> np.ndarray:
    n = 8
    D = np.zeros((n, n))
    for k in range(n):
        for i in range(n):
            D[k, i] = np.cos(np.pi * (2 * i + 1) * k / (2 * n))
    D *= np.sqrt(2.0 / n)
    D[0] *= np.sqrt(0.5)
    return D

DCT = _dct_matrix()


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG quality scaling: 50 -> base tables, 1..100 clamps to [1, 255]."""
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - quality * 2
    qy = np.clip((QT_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((QT_CHROMA * scale + 50) // 100, 1, 255)
    return qy.astype(np.int32), qc.astype(np.int32)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _magnitude(v: int) -> tuple[int, int]:
    """(size, amplitude bits) for a DC diff / AC coefficient."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def _encode_blocks(
    blocks: np.ndarray, q: np.ndarray, dc_codes, ac_codes, writer: _BitWriter,
    prev_dc: int,
) -> int:
    """Quantize + entropy-code a (n, 8, 8) float block array (already
    level-shifted). Returns the last DC value for differential chaining."""
    for b in range(blocks.shape[0]):
        coef = DCT @ blocks[b] @ DCT.T
        qc = np.round(coef / q).astype(np.int32)
        zz = qc.reshape(64)[ZZ_FLAT]
        # DC
        diff = int(zz[0]) - prev_dc
        prev_dc = int(zz[0])
        size, bits = _magnitude(diff)
        code, length = dc_codes[size]
        writer.write(code, length)
        if size:
            writer.write(bits, size)
        # AC: run-length of zeros + (run, size) Huffman symbol
        run = 0
        for kk in range(1, 64):
            v = int(zz[kk])
            if v == 0:
                run += 1
                continue
            while run > 15:
                code, length = ac_codes[0xF0]  # ZRL
                writer.write(code, length)
                run -= 16
            size, bits = _magnitude(v)
            code, length = ac_codes[(run << 4) | size]
            writer.write(code, length)
            writer.write(bits, size)
            run = 0
        if run:
            code, length = ac_codes[0x00]  # EOB
            writer.write(code, length)
    return prev_dc


def _to_blocks(plane: np.ndarray) -> np.ndarray:
    """(h, w) float plane -> (n_blocks, 8, 8), edge-replicated padding."""
    h, w = plane.shape
    ph, pw = -h % 8, -w % 8
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    H, W = plane.shape
    return (
        plane.reshape(H // 8, 8, W // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _marker(tag: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, tag, len(payload) + 2) + payload


def encode_jpeg(
    width: int, height: int, rgb: bytes, quality: int = 85,
    subsampling: str = "444",
) -> bytes:
    """Baseline JFIF encode of 8-bit RGB. ``subsampling='444'`` keeps
    full-resolution chroma (one 8x8 block per component per MCU);
    ``'420'`` downsamples chroma 2x2 (the real-world default: MCU = four
    Y blocks + one Cb + one Cr, Y sampling factor 2x2)."""
    if len(rgb) != width * height * 3:
        raise ValueError("rgb length != w*h*3")
    if subsampling not in ("444", "420"):
        raise ValueError("subsampling must be '444' or '420'")
    px = np.frombuffer(rgb, np.uint8).reshape(height, width, 3).astype(np.float64)
    r, g, b = px[..., 0], px[..., 1], px[..., 2]
    # BT.601 full-range as in JFIF
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    qy, qc = _quality_tables(quality)
    y_samp = 0x11 if subsampling == "444" else 0x22

    out = bytearray(b"\xff\xd8")  # SOI
    out += _marker(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    out += _marker(0xDB, b"\x00" + bytes(qy.reshape(64)[ZZ_FLAT].astype(np.uint8)))
    out += _marker(0xDB, b"\x01" + bytes(qc.reshape(64)[ZZ_FLAT].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, height, width, 3)
    sof += bytes([1, y_samp, 0]) + bytes([2, 0x11, 1]) + bytes([3, 0x11, 1])
    out += _marker(0xC0, sof)
    for cls, tid, bits, vals in (
        (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
        (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
        (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
        (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS),
    ):
        out += _marker(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))
    out += _marker(
        0xDA, bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0])
    )

    dc_y = _huff_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_y = _huff_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _huff_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _huff_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)

    writer = _BitWriter()
    pdy = pdcb = pdcr = 0
    if subsampling == "444":
        # MCU = one 8x8 block per component, interleaved Y, Cb, Cr.
        yb = _to_blocks(y - 128.0)
        cbb = _to_blocks(cb - 128.0)
        crb = _to_blocks(cr - 128.0)
        for i in range(yb.shape[0]):
            pdy = _encode_blocks(yb[i : i + 1], qy, dc_y, ac_y, writer, pdy)
            pdcb = _encode_blocks(cbb[i : i + 1], qc, dc_c, ac_c, writer, pdcb)
            pdcr = _encode_blocks(crb[i : i + 1], qc, dc_c, ac_c, writer, pdcr)
    else:
        # 4:2:0: pad planes to 16x16 MCUs; chroma = 2x2 box mean.
        def pad_to(p: np.ndarray, mult: int) -> np.ndarray:
            ph, pw = -p.shape[0] % mult, -p.shape[1] % mult
            return np.pad(p, ((0, ph), (0, pw)), mode="edge") if (ph or pw) else p

        yp = pad_to(y, 16) - 128.0
        cbp = pad_to(cb, 16)
        crp = pad_to(cr, 16)
        cbd = cbp.reshape(cbp.shape[0] // 2, 2, cbp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        ) - 128.0
        crd = crp.reshape(crp.shape[0] // 2, 2, crp.shape[1] // 2, 2).mean(
            axis=(1, 3)
        ) - 128.0
        H, W = yp.shape
        for my in range(H // 16):
            for mx in range(W // 16):
                # four Y blocks, left-to-right then top-to-bottom
                for by in range(2):
                    for bx in range(2):
                        blk = yp[
                            my * 16 + by * 8 : my * 16 + by * 8 + 8,
                            mx * 16 + bx * 8 : mx * 16 + bx * 8 + 8,
                        ]
                        pdy = _encode_blocks(
                            blk[None, :, :], qy, dc_y, ac_y, writer, pdy
                        )
                cbk = cbd[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                pdcb = _encode_blocks(cbk[None, :, :], qc, dc_c, ac_c, writer, pdcb)
                crk = crd[my * 8 : my * 8 + 8, mx * 8 : mx * 8 + 8]
                pdcr = _encode_blocks(crk[None, :, :], qc, dc_c, ac_c, writer, pdcr)
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 24 and self.pos < len(self.data):
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                nxt = self.data[self.pos] if self.pos < len(self.data) else 0
                if nxt == 0x00:
                    self.pos += 1  # stuffed byte
                else:
                    # marker (e.g. EOI): treat as end of entropy data
                    self.pos -= 1
                    byte = 0  # pad with zeros
                    self.acc = (self.acc << 8) | byte
                    self.nbits += 8
                    continue
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        self._fill()
        if self.nbits < n:  # past end: zero-pad
            self.acc <<= (n - self.nbits)
            self.nbits = n
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def read_huff(self, lookup: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read(1)
            if (length, code) in lookup:
                return lookup[(length, code)]
        raise ValueError("invalid JPEG Huffman code")


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    if bits < (1 << (size - 1)):
        return bits - (1 << size) + 1
    return bits


def decode_jpeg(data: bytes) -> tuple[int, int, bytes]:
    """Baseline JFIF decode -> (width, height, rgb bytes). Supports
    grayscale or YCbCr with per-axis sampling factors 1 or 2."""
    if data[:2] != JPEG_SIG:
        raise ValueError("not a JPEG")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    comps: list[dict] = []
    width = height = 0
    restart_interval = 0
    scan = None
    while pos < len(data):
        if data[pos] != 0xFF:
            pos += 1
            continue
        tag = data[pos + 1]
        if tag in (0xD8, 0x01) or 0xD0 <= tag <= 0xD7:
            pos += 2
            continue
        if tag == 0xD9:  # EOI
            break
        (length,) = struct.unpack_from(">H", data, pos + 2)
        body = data[pos + 4 : pos + 2 + length]
        pos += 2 + length
        if tag == 0xDB:
            i = 0
            while i < len(body):
                prec_id = body[i]
                prec, tid = prec_id >> 4, prec_id & 0x0F
                n = 64 * (2 if prec else 1)
                raw = body[i + 1 : i + 1 + n]
                if prec:
                    tab = np.frombuffer(raw, ">u2").astype(np.int32)
                else:
                    tab = np.frombuffer(raw, np.uint8).astype(np.int32)
                q = np.zeros(64, np.int32)
                q[ZZ_FLAT] = tab
                qtables[tid] = q.reshape(8, 8)
                i += 1 + n
        elif tag == 0xC4:
            i = 0
            while i < len(body):
                cls_id = body[i]
                cls, tid = cls_id >> 4, cls_id & 0x0F
                bits = list(body[i + 1 : i + 17])
                nvals = sum(bits)
                vals = list(body[i + 17 : i + 17 + nvals])
                huff[(cls, tid)] = _huff_lookup(bits, vals)
                i += 17 + nvals
        elif tag == 0xC0 or tag == 0xC1:
            _prec, height, width, ncomp = struct.unpack_from(">BHHB", body, 0)
            comps = []
            for c in range(ncomp):
                cid, samp, qid = body[6 + c * 3 : 9 + c * 3]
                comps.append(
                    {"id": cid, "h": samp >> 4, "v": samp & 0x0F, "q": qid}
                )
        elif tag == 0xC2:
            raise ValueError("progressive JPEG not supported (baseline only)")
        elif tag == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif tag == 0xDA:
            ns = body[0]
            order = []
            for c in range(ns):
                cid, tids = body[1 + c * 2], body[2 + c * 2]
                comp = next(x for x in comps if x["id"] == cid)
                comp["dc"] = tids >> 4
                comp["ac"] = tids & 0x0F
                order.append(comp)
            scan = (order, data[pos:])
            break
    if not comps or scan is None:
        raise ValueError("JPEG missing SOF/SOS")

    order, entropy = scan
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-width // (8 * hmax))
    mcuy = -(-height // (8 * vmax))
    planes = {}
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes[c["id"]] = np.zeros((ph, pw), np.float64)

    reader = _BitReader(entropy)
    pred = {c["id"]: 0 for c in comps}
    n_mcu = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and n_mcu and n_mcu % restart_interval == 0:
                # RSTn markers reset bit alignment + DC predictors
                reader.nbits = 0
                reader.acc = 0
                while reader.pos < len(reader.data) - 1:
                    if (
                        reader.data[reader.pos] == 0xFF
                        and 0xD0 <= reader.data[reader.pos + 1] <= 0xD7
                    ):
                        reader.pos += 2
                        break
                    reader.pos += 1
                pred = {c["id"]: 0 for c in comps}
            n_mcu += 1
            for c in order:
                q = qtables[c["q"]]
                dc_t = huff[(0, c["dc"])]
                ac_t = huff[(1, c["ac"])]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        zz = np.zeros(64, np.int32)
                        size = reader.read_huff(dc_t)
                        diff = _extend(reader.read(size), size)
                        pred[c["id"]] += diff
                        zz[0] = pred[c["id"]]
                        k = 1
                        while k < 64:
                            sym = reader.read_huff(ac_t)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if sym == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63:
                                break
                            zz[k] = _extend(reader.read(size), size)
                            k += 1
                        coef = np.zeros(64, np.float64)
                        coef[ZZ_FLAT] = zz
                        block = DCT.T @ (coef.reshape(8, 8) * q) @ DCT
                        py = (my * c["v"] + by) * 8
                        px_ = (mx * c["h"] + bx) * 8
                        planes[c["id"]][py : py + 8, px_ : px_ + 8] = block

    def upsampled(c: dict) -> np.ndarray:
        p = planes[c["id"]] + 128.0
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        return p[:height, :width]

    if len(comps) == 1:
        ych = np.clip(np.round(upsampled(comps[0])), 0, 255).astype(np.uint8)
        return width, height, np.repeat(ych.reshape(-1), 3).tobytes()
    y = upsampled(comps[0])
    cb = upsampled(comps[1]) - 128.0
    cr = upsampled(comps[2]) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return width, height, np.clip(np.round(rgb), 0, 255).astype(np.uint8).tobytes()
