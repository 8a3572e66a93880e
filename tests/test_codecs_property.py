"""Property-based tests for the pure codec layer (no Spark session):
any geometry + any byte content must round-trip losslessly through
every image container, and WAV resampling must match numpy interp.

Hypothesis shrinks failures to minimal cases — this is what caught the
'255-in-dimensions' PNM header class in review; these tests pin the
whole input space instead of fixed fixtures."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from pyblazing_spark.operators import multimodal as MM


@st.composite
def _image(draw):
    w = draw(st.integers(min_value=1, max_value=64))
    h = draw(st.integers(min_value=1, max_value=16))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.RandomState(seed)
    rgb = rng.randint(0, 256, size=w * h * 3, dtype=np.uint8).tobytes()
    return w, h, rgb


@settings(max_examples=40, deadline=None)
@given(_image())
def test_ppm_roundtrip(img):
    w, h, rgb = img
    assert MM.decode_ppm(MM.encode_ppm(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=40, deadline=None)
@given(_image())
def test_bmp_roundtrip(img):
    w, h, rgb = img
    assert MM.decode_bmp24(MM.encode_bmp24(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=40, deadline=None)
@given(_image())
def test_png_roundtrip(img):
    w, h, rgb = img
    assert MM.decode_png(MM.encode_png(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=40, deadline=None)
@given(_image())
def test_cross_format_transcode_chain(img):
    """ppm -> png -> bmp -> ppm equals the directly-encoded ppm."""
    w, h, rgb = img
    _, _, via_png = MM.decode_png(MM.encode_png(w, h, rgb))
    _, _, via_bmp = MM.decode_bmp24(MM.encode_bmp24(w, h, via_png))
    assert MM.encode_ppm(w, h, via_bmp) == MM.encode_ppm(w, h, rgb)


@settings(max_examples=30, deadline=None)
@given(
    st.integers(min_value=1, max_value=200),
    st.integers(min_value=0, max_value=2**31 - 1),
    st.sampled_from([4000, 6000, 8000, 11025, 16000]),
)
def test_wav_resample_matches_numpy(n, seed, target):
    src = 8000
    rng = np.random.RandomState(seed)
    samples = rng.randint(-32768, 32768, size=n).astype("<i2")
    wav = MM.encode_wav_pcm16(samples, src)
    # decode + resample through the same pure path the kernel uses
    import io
    import wave

    with wave.open(io.BytesIO(wav)) as w:
        assert (w.getframerate(), w.getnframes()) == (src, n)
    n_out = n * target // src
    pos = np.arange(n_out) * (src / target)
    expected = np.round(np.interp(pos, np.arange(n), samples.astype(float))).astype("<i2")
    out = MM.encode_wav_pcm16(expected, target)
    with wave.open(io.BytesIO(out)) as w:
        assert (w.getframerate(), w.getnframes()) == (target, n_out)
        got = np.frombuffer(w.readframes(n_out), dtype="<i2")
    assert np.array_equal(got, expected)


@st.composite
def _paletted_image(draw):
    w = draw(st.integers(min_value=1, max_value=48))
    h = draw(st.integers(min_value=1, max_value=16))
    nc = draw(st.integers(min_value=1, max_value=256))
    seed = draw(st.integers(min_value=0, max_value=2**31 - 1))
    rng = np.random.RandomState(seed)
    colors = rng.randint(0, 256, (nc, 3), dtype=np.uint8)
    img = colors[rng.randint(0, nc, (h, w))]
    return w, h, img.tobytes()


@settings(max_examples=40, deadline=None)
@given(_paletted_image())
def test_gif_roundtrip(img):
    """Any <=256-color image round-trips the from-scratch GIF-LZW coder
    losslessly (palette build, variable code widths, dictionary growth
    and reset, sub-block framing)."""
    from pyblazing_spark.operators import gif as G

    w, h, rgb = img
    assert G.decode_gif(G.encode_gif(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=40, deadline=None)
@given(_image())
def test_tiff_roundtrip(img):
    """Uncompressed TIFF (IFD + single strip) is lossless for any
    geometry/content."""
    w, h, rgb = img
    assert MM.decode_tiff(MM.encode_tiff(w, h, rgb)) == (w, h, rgb)


@settings(max_examples=40, deadline=None)
@given(_image())
def test_webp_lossless_roundtrip(img):
    from pyblazing_spark.operators.webp import (
        decode_webp_lossless,
        encode_webp_lossless,
    )

    w, h, rgb = img
    blob = encode_webp_lossless(w, h, rgb)
    assert blob[:4] == b"RIFF" and blob[8:16] == b"WEBPVP8L"
    assert decode_webp_lossless(blob) == (w, h, rgb)


@settings(max_examples=25, deadline=None)
@given(_image())
def test_webp_package_merge_is_kraft_tight(img):
    """The length-limited Huffman must produce a COMPLETE prefix code
    (Kraft sum exactly 1) within the VP8L 15-bit cap for any pixel
    frequency profile."""
    from pyblazing_spark.operators.webp import _limited_code_lengths

    w, h, rgb = img
    vals, counts = np.unique(
        np.frombuffer(rgb, dtype=np.uint8), return_counts=True
    )
    freqs = {int(v): int(c) for v, c in zip(vals, counts)}
    lengths = _limited_code_lengths(freqs, 15)
    if len(freqs) == 1:
        assert list(lengths.values()) == [1]
        return
    assert max(lengths.values()) <= 15
    assert abs(sum(2.0 ** -v for v in lengths.values()) - 1.0) < 1e-12


def test_vp8l_simple_code_two_symbols_in_read_order():
    """VP8L 5.2.2: in a simple prefix code the FIRST-listed symbol gets
    code 0 — even when a foreign encoder lists the pair in DESCENDING
    symbol order (our encoder always sorts, so only foreign streams hit
    this; ADVICE r4)."""
    from pyblazing_spark.operators.webp import _BitReader, _read_prefix_code

    bits = []
    bits.append((1, 1))  # simple code
    bits.append((1, 1))  # num_symbols = 2
    bits.append((1, 1))  # first symbol uses 8 bits
    bits.append((200, 8))  # first = 200 (the LARGER value, listed first)
    bits.append((10, 8))  # second = 10
    acc = n = 0
    for v, w in bits:
        acc |= v << n
        n += w
    data = acc.to_bytes((n + 7) // 8, "little")
    dec = _read_prefix_code(_BitReader(data), 256)
    # code 0 -> first-listed (200), code 1 -> second-listed (10)
    assert dec.read(_BitReader(b"\x00")) == 200
    assert dec.read(_BitReader(b"\x01")) == 10


def test_gif_interlaced_decode():
    """Interlaced GIFs (foreign encoders) must decode to the original
    pixel order: build one independently — reorder rows into the four
    GIF89a passes, LZW-encode, set the interlace flag — and assert the
    decoder restores the sequential image. Dims exercise passes that
    are empty or ragged."""
    import struct

    import numpy as np

    from pyblazing_spark.operators.gif import _lzw_encode, decode_gif

    rng = np.random.default_rng(5)
    for w, h in ((8, 16), (5, 9), (3, 3), (4, 1)):
        pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
        idx = rng.integers(0, 4, size=(h, w), dtype=np.uint8)
        order = (
            list(range(0, h, 8)) + list(range(4, h, 8))
            + list(range(2, h, 4)) + list(range(1, h, 2))
        )
        stored = idx[order]  # rows as an interlaced encoder writes them
        mcs = 2
        out = bytearray(b"GIF89a")
        out += struct.pack("<HHBBB", w, h, 0x80 | 1, 0, 0)  # 4-entry table
        out += pal.tobytes()
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0x40)  # interlaced
        out.append(mcs)
        comp = _lzw_encode([int(i) for i in stored.reshape(-1)], mcs)
        for i in range(0, len(comp), 255):
            blk = comp[i : i + 255]
            out.append(len(blk))
            out += blk
        out += b"\x00\x3b"
        gw, gh, rgb = decode_gif(bytes(out))
        assert (gw, gh) == (w, h)
        assert rgb == pal[idx.reshape(-1)].tobytes(), f"{w}x{h}"
