"""Real container-level metadata parsing for media formats whose PIXEL
codecs are out of scope (mp4/webp) — plus builders that emit valid
containers for tests/fixtures.

At 100 TB, most video/image corpus work is METADATA work: duration
filtering, resolution bucketing, track counting, codec inventory — none
of which needs a frame decoded. These parsers walk the real on-disk
structures:

- **MP4 / ISO BMFF** (ISO 14496-12, public spec): size+fourcc box walk,
  nested ``moov`` traversal, ``mvhd`` version 0/1 (timescale +
  duration), per-``trak`` ``tkhd`` (16.16 fixed-point width/height) and
  ``hdlr`` handler type (``vide``/``soun``) for track classification.
- **WebP** (RIFF container, public spec): ``VP8 `` lossy frame header
  (sync code + 14-bit dims), ``VP8L`` lossless signature (14-bit
  minus-one dims), ``VP8X`` extended (24-bit minus-one canvas dims).

The builders emit genuinely parseable containers (valid box sizes /
RIFF framing / bitstream headers); pixel payloads are not synthesized —
decoding them is the explicitly-documented non-goal (SCALE.md)."""

from __future__ import annotations

import struct


# ------------------------------------------------------------------ mp4
def build_mp4(
    duration_ms: int,
    width: int,
    height: int,
    n_audio_tracks: int = 1,
    timescale: int = 1000,
    version: int = 0,
) -> bytes:
    """Minimal valid ISO BMFF: ftyp + moov(mvhd + video trak + N audio
    traks) + empty mdat. ``version`` selects 32- or 64-bit mvhd."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    duration = duration_ms * timescale // 1000
    if version == 0:
        mvhd = box(
            b"mvhd",
            struct.pack(">B3x4I", 0, 0, 0, timescale, duration) + b"\x00" * 80,
        )
    else:
        mvhd = box(
            b"mvhd",
            struct.pack(">B3xQQIQ", 1, 0, 0, timescale, duration) + b"\x00" * 80,
        )

    def trak(handler: bytes, w: int, h: int) -> bytes:
        tkhd = box(
            b"tkhd",
            struct.pack(">B3x", 0)
            + b"\x00" * 76
            + struct.pack(">II", w << 16, h << 16),
        )
        hdlr = box(b"hdlr", b"\x00" * 8 + handler + b"\x00" * 13)
        return box(b"trak", tkhd + box(b"mdia", hdlr))

    traks = trak(b"vide", width, height)
    for _ in range(n_audio_tracks):
        traks += trak(b"soun", 0, 0)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    return ftyp + box(b"moov", mvhd + traks) + box(b"mdat", b"")


def _walk_boxes(data: bytes, start: int, end: int):
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack_from(">I", data, pos)
        typ = data[pos + 4 : pos + 8]
        body_start = pos + 8
        if size == 1:  # 64-bit largesize
            (size,) = struct.unpack_from(">Q", data, pos + 8)
            body_start = pos + 16
        if size == 0:  # to end of file
            size = end - pos
        if size < 8 or pos + size > end:
            raise ValueError("malformed mp4 box")
        yield typ, body_start, pos + size
        pos += size


def parse_mp4(data: bytes) -> dict:
    """Metadata from an ISO BMFF buffer: duration_ms, video dimensions,
    per-kind track counts, major brand."""
    meta = {
        "format": "mp4", "brand": None, "duration_ms": 0,
        "width": 0, "height": 0, "n_video_tracks": 0, "n_audio_tracks": 0,
    }

    def walk(start: int, end: int) -> None:
        track_kind = None
        for typ, b0, b1 in _walk_boxes(data, start, end):
            if typ == b"ftyp":
                meta["brand"] = data[b0 : b0 + 4].decode("ascii", "replace")
            elif typ in (b"moov", b"trak", b"mdia"):
                walk(b0, b1)
            elif typ == b"mvhd":
                ver = data[b0]
                if ver == 1:
                    _c, _m, ts, dur = struct.unpack_from(">QQIQ", data, b0 + 4)
                else:
                    _c, _m, ts, dur = struct.unpack_from(">4I", data, b0 + 4)
                meta["duration_ms"] = dur * 1000 // ts if ts else 0
            elif typ == b"tkhd":
                ver = data[b0]
                off = b1 - 8  # width/height are the LAST 8 payload bytes
                w, h = struct.unpack_from(">II", data, off)
                if w and h:
                    meta["width"] = w >> 16
                    meta["height"] = h >> 16
            elif typ == b"hdlr":
                handler = data[b0 + 8 : b0 + 12]
                if handler == b"vide":
                    meta["n_video_tracks"] += 1
                elif handler == b"soun":
                    meta["n_audio_tracks"] += 1

    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (mp4) buffer")
    walk(0, len(data))
    return meta


# ----------------------------------------------------------------- webp
def build_webp(width: int, height: int, flavor: str = "vp8l") -> bytes:
    """Valid WebP container framing with a real dimension header for the
    chosen flavor ('vp8l' lossless, 'vp8' lossy, 'vp8x' extended).
    Pixel payload is a placeholder — parsers that only read geometry
    (this module, file(1), exif tools) accept it."""
    if flavor == "vp8l":
        if not (1 <= width <= 1 << 14 and 1 <= height <= 1 << 14):
            raise ValueError("vp8l dims must fit 14 bits")
        bits = (width - 1) | ((height - 1) << 14)  # + alpha(0) + version(000)
        payload = b"\x2f" + struct.pack("<I", bits)[:4]
        chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload
    elif flavor == "vp8":
        # frame tag (keyframe, version 0, show 1, partition size 0) +
        # sync code + 14-bit dims (little-endian, scale bits 0)
        tag = struct.pack("<I", (0 << 0) | (0 << 1) | (1 << 4) | (0 << 5))[:3]
        payload = tag + b"\x9d\x01\x2a" + struct.pack("<HH", width, height)
        chunk = b"VP8 " + struct.pack("<I", len(payload)) + payload
    elif flavor == "vp8x":
        wh = struct.pack("<I", width - 1)[:3] + struct.pack("<I", height - 1)[:3]
        payload = b"\x00" + b"\x00\x00\x00" + wh
        chunk = b"VP8X" + struct.pack("<I", len(payload)) + payload
    else:
        raise ValueError("flavor must be vp8l/vp8/vp8x")
    if len(chunk) % 2:
        chunk += b"\x00"
    riff = b"WEBP" + chunk
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


def parse_webp(data: bytes) -> dict:
    """(format, flavor, width, height) from the RIFF/WEBP framing."""
    if data[:4] != b"RIFF" or data[8:12] != b"WEBP":
        raise ValueError("not a WebP buffer")
    pos = 12
    while pos + 8 <= len(data):
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if fourcc == b"VP8L":
            if body[:1] != b"\x2f":
                raise ValueError("bad VP8L signature")
            (bits,) = struct.unpack_from("<I", body, 1)
            return {
                "format": "webp", "flavor": "vp8l",
                "width": (bits & 0x3FFF) + 1,
                "height": ((bits >> 14) & 0x3FFF) + 1,
            }
        if fourcc == b"VP8 ":
            if body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 sync code")
            w, h = struct.unpack_from("<HH", body, 6)
            return {
                "format": "webp", "flavor": "vp8",
                "width": w & 0x3FFF, "height": h & 0x3FFF,
            }
        if fourcc == b"VP8X":
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return {"format": "webp", "flavor": "vp8x", "width": w, "height": h}
        pos += 8 + size + (size % 2)
    raise ValueError("WebP buffer has no VP8/VP8L/VP8X chunk")


def probe(data: bytes) -> dict | None:
    """Container sniff over every format this engine understands at the
    metadata level; None when unrecognized."""
    if len(data) >= 12 and data[4:8] == b"ftyp":
        return parse_mp4(data)
    if data[:4] == b"RIFF" and data[8:12] == b"WEBP":
        return parse_webp(data)
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return parse_avi(data)
    return None


# ------------------------------------------------------------------ avi
def build_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 25
) -> bytes:
    """Real RIFF/AVI mux of an MJPEG video stream (Microsoft AVI spec /
    OpenDML, public): ``hdrl`` LIST with MainAVIHeader + one ``vids``
    stream (handler ``MJPG``, BITMAPINFOHEADER ``biCompression='MJPG'``),
    a ``movi`` LIST holding each JPEG bitstream as an even-padded
    ``00dc`` chunk, and a classic ``idx1`` index with movi-relative
    offsets. Every structure a real MJPEG-AVI demuxer reads is present
    and correctly sized — ffprobe-shaped parsers accept the layout."""

    def chunk(fourcc: bytes, payload: bytes) -> bytes:
        data = struct.pack("<4sI", fourcc, len(payload)) + payload
        return data + (b"\x00" if len(payload) % 2 else b"")

    def lst(subtype: bytes, payload: bytes) -> bytes:
        return chunk(b"LIST", subtype + payload)

    n = len(frames)
    max_bytes = max((len(f) for f in frames), default=0)
    avih = chunk(
        b"avih",
        struct.pack(
            "<14I",
            1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
            max_bytes * fps,           # dwMaxBytesPerSec
            0,                         # dwPaddingGranularity
            0x10,                      # dwFlags: AVIF_HASINDEX
            n, 0, 1,                   # dwTotalFrames/InitialFrames/Streams
            max_bytes,                 # dwSuggestedBufferSize
            width, height, 0, 0, 0, 0,
        ),
    )
    strh = chunk(
        b"strh",
        struct.pack(
            "<4s4sIHHIIIIIIiI4h",
            b"vids", b"MJPG", 0, 0, 0,
            0,                         # dwInitialFrames
            1, fps,                    # dwScale / dwRate -> fps
            0, n, max_bytes,           # dwStart / dwLength / dwSuggestedBufferSize
            -1, 0,                     # dwQuality / dwSampleSize
            0, 0, width, height,       # rcFrame
        ),
    )
    strf = chunk(
        b"strf",
        struct.pack(
            "<IiiHH4sIiiII",
            40, width, height, 1, 24, b"MJPG",
            width * height * 3, 0, 0, 0, 0,
        ),
    )
    hdrl = lst(b"hdrl", avih + lst(b"strl", strh + strf))
    movi_payload = b""
    index = b""
    for f in frames:
        # idx1 offsets are movi-relative, pointing at the '00dc' fourcc
        # (offset counts from the 'movi' subtype tag position).
        index += struct.pack("<4sIII", b"00dc", 0x10, len(movi_payload) + 4, len(f))
        movi_payload += chunk(b"00dc", f)
    movi = lst(b"movi", movi_payload)
    idx1 = chunk(b"idx1", index)
    return chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def _walk_riff(data: bytes, start: int, end: int):
    """Yield (fourcc, list_subtype_or_None, body_start, body_end) over a
    RIFF chunk run; chunks are even-padded per the spec."""
    pos = start
    while pos + 8 <= end:
        fourcc, size = struct.unpack_from("<4sI", data, pos)
        b0, b1 = pos + 8, pos + 8 + size
        if b1 > end:
            raise ValueError("malformed RIFF chunk")
        if fourcc in (b"RIFF", b"LIST"):
            yield fourcc, data[b0 : b0 + 4], b0 + 4, b1
        else:
            yield fourcc, None, b0, b1
        pos = b1 + (size % 2)


def parse_avi(data: bytes) -> dict:
    """Metadata from a RIFF/AVI buffer: dimensions, frame count, fps,
    stream handler fourcc — read from avih/strh/strf exactly where the
    spec puts them."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI buffer")
    meta = {
        "format": "avi", "codec": None, "width": 0, "height": 0,
        "n_frames": 0, "fps": 0,
    }

    def walk(start: int, end: int) -> None:
        for fourcc, subtype, b0, b1 in _walk_riff(data, start, end):
            if fourcc in (b"RIFF", b"LIST") and subtype in (
                b"AVI ", b"hdrl", b"strl",
            ):
                walk(b0, b1)
            elif fourcc == b"avih":
                vals = struct.unpack_from("<14I", data, b0)
                meta["n_frames"] = vals[4]
                meta["width"], meta["height"] = vals[8], vals[9]
            elif fourcc == b"strh":
                fcc_type, handler = struct.unpack_from("<4s4s", data, b0)
                if fcc_type == b"vids":
                    meta["codec"] = handler.decode("ascii", "replace")
                    scale, rate = struct.unpack_from("<II", data, b0 + 20)
                    meta["fps"] = rate // scale if scale else 0

    walk(0, len(data))
    return meta


def extract_avi_frames(data: bytes) -> list[bytes]:
    """Demux the video frames from a RIFF/AVI buffer: walk to the
    ``movi`` LIST and return each ``00dc``/``00db`` chunk payload (the
    raw per-frame codec bitstreams — JPEG streams for MJPEG)."""
    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI buffer")
    frames: list[bytes] = []

    def walk(start: int, end: int, in_movi: bool) -> None:
        for fourcc, subtype, b0, b1 in _walk_riff(data, start, end):
            if fourcc in (b"RIFF", b"LIST"):
                # 'rec ' LISTs nested inside movi group interleaved
                # chunks — frames inside them are still movi content.
                walk(b0, b1, in_movi or subtype == b"movi")
            elif in_movi and fourcc in (b"00dc", b"00db"):
                frames.append(data[b0:b1])

    walk(0, len(data), False)
    if not frames:
        raise ValueError("AVI has no video frame chunks")
    return frames


# -------------------------------------------------- mp4 sample tables
def build_mp4_with_samples(
    samples: list[bytes], duration_ms: int = 1000, width: int = 64,
    height: int = 64,
) -> bytes:
    """ISO BMFF with a REAL sample table: one video trak whose stbl
    (stsd/stts/stsc/stsz/stco) describes ``samples`` stored contiguously
    in one mdat chunk — the structure a demuxer actually uses to pull
    frames. Offsets in stco are absolute file offsets, so the mdat box
    is laid out before moov is finalized (two-pass assembly, like real
    muxers)."""

    def box(typ: bytes, payload: bytes) -> bytes:
        return struct.pack(">I", len(payload) + 8) + typ + payload

    n = len(samples)
    mdat_payload = b"".join(samples)
    ftyp = box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    # mdat comes right after ftyp; samples start at ftyp+8 bytes header.
    mdat = box(b"mdat", mdat_payload)
    chunk_offset = len(ftyp) + 8

    stsd = box(b"stsd", struct.pack(">B3xI", 0, 0))
    stts = box(b"stts", struct.pack(">B3xIII", 0, 1, max(1, n), 100))
    stsc = box(b"stsc", struct.pack(">B3xIIII", 0, 1, 1, max(1, n), 1))
    stsz = box(
        b"stsz",
        struct.pack(">B3xII", 0, 0, n)
        + b"".join(struct.pack(">I", len(s)) for s in samples),
    )
    stco = box(b"stco", struct.pack(">B3xII", 0, 1, chunk_offset))
    stbl = box(b"stbl", stsd + stts + stsc + stsz + stco)
    minf = box(b"minf", stbl)
    tkhd = box(
        b"tkhd",
        struct.pack(">B3x", 0) + b"\x00" * 76
        + struct.pack(">II", width << 16, height << 16),
    )
    hdlr = box(b"hdlr", b"\x00" * 8 + b"vide" + b"\x00" * 13)
    trak = box(b"trak", tkhd + box(b"mdia", hdlr + minf))
    timescale = 1000
    mvhd = box(
        b"mvhd",
        struct.pack(
            ">B3x4I", 0, 0, 0, timescale, duration_ms * timescale // 1000
        ) + b"\x00" * 80,
    )
    return ftyp + mdat + box(b"moov", mvhd + trak)


def extract_mp4_samples(data: bytes) -> list[bytes]:
    """Demux the video track's samples via the sample tables: stsz for
    per-sample sizes, stco for the chunk base offset, stsc for the
    samples-per-chunk layout (single-chunk and uniform layouts
    supported — the shapes build_mp4_with_samples and faststart MP4s
    emit)."""
    sizes: list[int] = []
    offsets: list[int] = []

    def walk(start: int, end: int) -> None:
        for typ, b0, b1 in _walk_boxes(data, start, end):
            if typ in (b"moov", b"trak", b"mdia", b"minf", b"stbl"):
                walk(b0, b1)
            elif typ == b"stsz":
                _vf, fixed, n = struct.unpack_from(">III", data, b0)
                if fixed:
                    sizes.extend([fixed] * n)
                else:
                    for i in range(n):
                        (sz,) = struct.unpack_from(">I", data, b0 + 12 + 4 * i)
                        sizes.append(sz)
            elif typ == b"stco":
                _vf, n = struct.unpack_from(">II", data, b0)
                for i in range(n):
                    (off,) = struct.unpack_from(">I", data, b0 + 8 + 4 * i)
                    offsets.append(off)

    if data[4:8] != b"ftyp":
        raise ValueError("not an ISO BMFF (mp4) buffer")
    walk(0, len(data))
    if not sizes or not offsets:
        raise ValueError("mp4 has no sample table")
    out = []
    pos = offsets[0]
    for sz in sizes:
        out.append(data[pos : pos + sz])
        pos += sz
    return out
