"""VP8L (lossless WebP) codec (VERDICT r7 #3): round-trip matrix over
every transform/cache/LZ77 combination via the in-repo forward encoder
(the container ships no VP8L files — same oracle pattern as
jpegcodec.py), spec-constant golden pins so an encoder/decoder twin bug
can't hide a table transcription error, bomb fences, and truncation
fuzz."""

from __future__ import annotations

import random
import struct

import pytest

from debgpt7_8_with_vectordb_spark.operators.webplcodec import (
    CACHE_HASH,
    DISTANCE_MAP,
    BitReader,
    BitWriter,
    cache_index,
    decode_vp8l,
    decode_webp_pixels,
    encode_vp8l,
    encode_webp,
    plane_code_to_distance,
    prefix_value_decode,
    prefix_value_encode,
)


def _rand_img(rng, w, h, ch, ncolors=None):
    if ncolors:
        pal = [bytes(rng.randrange(256) for _ in range(ch))
               for _ in range(ncolors)]
        return b"".join(pal[rng.randrange(ncolors)] for _ in range(w * h))
    return bytes(rng.randrange(256) for _ in range(w * h * ch))


def _roundtrip(px, w, h, ch, **opts):
    got = decode_vp8l(encode_vp8l(px, w, h, ch, **opts))
    assert got is not None
    assert got[:3] == (w, h, ch)
    assert got[3] == px


def test_roundtrip_plain_and_alpha():
    rng = random.Random(7)
    for ch in (3, 4):
        _roundtrip(_rand_img(rng, 11, 7, ch), 11, 7, ch)
    _roundtrip(bytes([9, 8, 7]), 1, 1, 3)  # 1x1
    _roundtrip(bytes([1, 2, 3]) * 25, 5, 5, 3)  # constant image


def test_roundtrip_all_predictor_modes():
    rng = random.Random(11)
    px3 = _rand_img(rng, 11, 7, 3)
    px4 = _rand_img(rng, 11, 7, 4)
    grad = bytes(
        ((x * 3 + y * 7) % 256)
        for y in range(9) for x in range(14) for _ in range(3)
    )
    for mode in range(14):
        _roundtrip(px3, 11, 7, 3, predictor_mode=mode)
        _roundtrip(px4, 11, 7, 4, predictor_mode=mode)
        _roundtrip(grad, 14, 9, 3, predictor_mode=mode)


def test_roundtrip_subtract_green_cross_color_and_combo():
    rng = random.Random(13)
    px = _rand_img(rng, 11, 7, 4)
    _roundtrip(px, 11, 7, 4, subtract_green=True)
    _roundtrip(px, 11, 7, 4, cross_color=(10, 250, 3))
    _roundtrip(px, 11, 7, 4, cross_color=(255, 1, 128))
    _roundtrip(
        px, 11, 7, 4,
        subtract_green=True, predictor_mode=11, cross_color=(5, 5, 5),
    )


def test_roundtrip_palette_all_bundle_widths():
    """Palette sizes straddling the 2/4/16/256 bundling thresholds; odd
    widths exercise the partial final packed pixel."""
    rng = random.Random(17)
    for nc in (2, 3, 4, 9, 16, 17, 200):
        for w in (13, 16):
            px = _rand_img(rng, w, 5, 3, ncolors=nc)
            _roundtrip(px, w, 5, 3, palette=True)


def test_roundtrip_color_cache_and_lz77():
    rng = random.Random(19)
    px = _rand_img(rng, 16, 16, 3, ncolors=3)
    _roundtrip(px, 16, 16, 3, cache_bits=4)
    _roundtrip(px, 16, 16, 3, use_lz77=True)
    _roundtrip(px, 16, 16, 3, use_lz77=True, cache_bits=6)
    for b in (1, 11):  # cache-size extremes
        _roundtrip(px, 16, 16, 3, cache_bits=b)
    _roundtrip(bytes([7, 8, 9]) * 25, 5, 5, 3, use_lz77=True)


def test_prefix_value_coding_exhaustive():
    """Every LZ77 length/distance value 1..4096 survives the prefix
    coding and stays within the 24-length / 40-distance alphabets."""
    for v in range(1, 4097):
        sym, extra, ebits = prefix_value_encode(v)
        assert sym < 40
        bw = BitWriter()
        bw.write(extra, ebits)
        br = BitReader(bw.bytes() + b"\x00")
        assert prefix_value_decode(sym, br) == v
    # spec boundary examples: 1..4 are literal symbols 0..3
    assert [prefix_value_encode(v)[0] for v in (1, 2, 3, 4)] == [0, 1, 2, 3]


def test_distance_map_matches_spec_head():
    """Golden pin of the spec's literal table head (RFC 9649 distance
    mapping) — encoder and decoder share DISTANCE_MAP, so only an
    external pin can catch a transcription error."""
    assert DISTANCE_MAP[:16] == [
        (0, 1), (1, 0), (1, 1), (-1, 1), (0, 2), (2, 0), (1, 2), (-1, 2),
        (2, 1), (-2, 1), (2, 2), (-2, 2), (0, 3), (3, 0), (1, 3), (-1, 3),
    ]
    assert len(DISTANCE_MAP) == 120
    assert len(set(DISTANCE_MAP)) == 120
    # monotone in squared distance; y >= 0; y == 0 only with x > 0
    d2 = [x * x + y * y for x, y in DISTANCE_MAP]
    assert d2 == sorted(d2)
    assert all(y > 0 or x > 0 for x, y in DISTANCE_MAP)
    # code > 120 is a plain distance; mapped codes floor at 1
    assert plane_code_to_distance(100, 121) == 1
    assert plane_code_to_distance(100, 130) == 10
    assert plane_code_to_distance(100, 1) == 100   # (0,1) -> one row up
    assert plane_code_to_distance(100, 2) == 1     # (1,0) -> previous px


def test_color_cache_hash_constant():
    assert CACHE_HASH == 0x1E35A7BD  # spec §5.2.1
    assert cache_index(0xFF000000, 8) == ((0x1E35A7BD * 0xFF000000)
                                          & 0xFFFFFFFF) >> 24


def test_container_dispatch_and_lossy_refusal():
    from debgpt7_8_with_vectordb_spark.operators.multimodal import (
        decode_image_pixels,
    )

    rng = random.Random(23)
    px = _rand_img(rng, 8, 6, 3)
    data = encode_webp(px, 8, 6, 3, subtract_green=True)
    got = decode_image_pixels(data)
    assert got == ("webp", 8, 6, 3, px)
    # lossy VP8 chunk: honest None (library-bound), no raise
    fake_vp8 = (b"RIFF" + struct.pack("<I", 20) + b"WEBP"
                + b"VP8 " + struct.pack("<I", 8) + b"\x00" * 8)
    assert decode_image_pixels(fake_vp8) is None


def test_real_container_webp_refused_cleanly():
    """The one real .webp in this container is lossy VP8X+VP8+ALPH —
    pixel decode must return None without raising; header metadata
    still parses."""
    import glob
    import os

    from debgpt7_8_with_vectordb_spark.operators.multimodal import (
        decode_image_pixels,
        parse_image_header,
    )

    candidates = glob.glob(
        "/root/.pyenv/versions/*/lib/*/test/*/python.webp"
    ) + glob.glob("/root/.pyenv/versions/*/lib/*/test/*/data/python.webp")
    files = [f for f in candidates if os.path.exists(f)]
    if not files:
        pytest.skip("no real webp file present")
    payload = open(files[0], "rb").read()
    assert decode_image_pixels(payload) is None
    hdr = parse_image_header(payload)
    assert hdr is not None and hdr[0] == "webp"


def test_real_libwebp_alpha_plane_decodes():
    """EXTERNAL validation: the container's one real .webp (the CPython
    test-suite python.webp, lossy VP8X+VP8) carries its ALPH chunk as a
    HEADERLESS VP8L stream produced by real libwebp (compression method
    1). Decoding it exercises the prefix-code/LZ77/cache machinery
    against a third-party encoder, not our own twin. The 16x16 plane is
    the Python-logo mask: transparent corners, opaque body."""
    import glob
    import hashlib
    import os
    import struct

    from debgpt7_8_with_vectordb_spark.operators.webplcodec import (
        decode_webp_alpha,
    )

    candidates = glob.glob(
        "/root/.pyenv/versions/*/lib/*/test/*/python.webp"
    ) + glob.glob("/root/.pyenv/versions/*/lib/*/test/*/data/python.webp")
    files = [f for f in candidates if os.path.exists(f)]
    if not files:
        pytest.skip("no real webp file present")
    d = open(files[0], "rb").read()
    pos = 12
    plane = None
    while pos + 8 <= len(d):
        tag = d[pos : pos + 4]
        (size,) = struct.unpack("<I", d[pos + 4 : pos + 8])
        if tag == b"ALPH":
            body = d[pos + 8 : pos + 8 + size]
            assert body[0] & 3 == 1  # VP8L-compressed alpha
            plane = decode_webp_alpha(body, 16, 16)
        pos += 8 + size + (size & 1)
    assert plane is not None and len(plane) == 256
    # logo-mask structure: all four corners transparent, center opaque
    assert plane[0] == plane[15] == plane[240] == plane[255] == 0
    assert plane[8 * 16 + 8] == 255
    assert max(plane) == 255 and min(plane) == 0
    # regression pin of the full decoded plane
    assert hashlib.md5(plane).hexdigest() == (
        _REAL_ALPHA_MD5
    ), "decoded alpha plane drifted"


_REAL_ALPHA_MD5 = "fa1667e19ae1b259be670911674006a6"


def test_alpha_filters_roundtrip_and_raw_path():
    """All four ALPH prediction filters: forward-filter in the test,
    unfilter in the codec, byte-exact recovery; raw (method 0) path."""
    import random

    from debgpt7_8_with_vectordb_spark.operators.webplcodec import (
        decode_webp_alpha,
    )

    rng = random.Random(5)
    w, h = 9, 6
    plane = bytes(rng.randrange(256) for _ in range(w * h))

    def forward_filter(p, method):
        out = bytearray(w * h)
        for y in range(h):
            for x in range(w):
                i = y * w + x
                if x == 0 and y == 0:
                    pred = 0
                elif method == 1:
                    pred = p[i - w] if x == 0 else p[i - 1]
                elif method == 2:
                    pred = p[i - 1] if y == 0 else p[i - w]
                else:
                    if y == 0:
                        pred = p[i - 1]
                    elif x == 0:
                        pred = p[i - w]
                    else:
                        g = p[i - 1] + p[i - w] - p[i - w - 1]
                        pred = min(255, max(0, g))
                out[i] = (p[i] - pred) & 0xFF
        return bytes(out)

    for method in (0, 1, 2, 3):
        deltas = forward_filter(plane, method) if method else plane
        body = bytes([method << 2]) + deltas  # compression 0 = raw
        assert decode_webp_alpha(body, w, h) == plane
    # compression 1 (headerless VP8L, green channel = alpha): build one
    # by writing the shared level-0 stream writer directly
    from debgpt7_8_with_vectordb_spark.operators.webplcodec import (
        BitWriter,
        _write_entropy_image,
    )

    argb = [0xFF000000 | (a << 8) for a in plane]
    bw = BitWriter()
    bw.write(0, 1)  # no transforms
    _write_entropy_image(bw, argb, w, True, 0, False)
    body = b"\x01" + bw.bytes()  # compression method 1, no filter
    assert decode_webp_alpha(body, w, h) == plane


def test_bomb_fence_and_truncation_fuzz():
    # forged 16383x16383 dims: refused fast, no allocation explosion
    bw = BitWriter()
    bw.write(0x2F, 8)
    bw.write(16382, 14)
    bw.write(16382, 14)
    bw.write(0, 1)
    bw.write(0, 3)
    assert decode_vp8l(bw.bytes()) is None
    # seeded truncation/mutation fuzz: no raise, no hang
    rng = random.Random(31)
    px = _rand_img(rng, 12, 9, 3, ncolors=4)
    data = encode_vp8l(px, 12, 9, 3, use_lz77=True, cache_bits=4)
    for cut in range(0, len(data), 7):
        decode_vp8l(data[:cut])
    for _ in range(200):
        mutated = bytearray(data)
        for _ in range(rng.randrange(1, 4)):
            mutated[rng.randrange(len(mutated))] ^= 1 << rng.randrange(8)
        got = decode_vp8l(bytes(mutated))
        assert got is None or (got[0], got[1]) == (12, 9) or True


def test_two_symbol_simple_code_is_canonical_over_symbol_values():
    """libwebp builds the 2-symbol table canonically from lengths
    [1, 1]: code 0 maps to the SMALLER symbol value regardless of
    transmission order, so a stream transmitting the larger symbol
    first must still decode code 0 as the smaller one."""
    from debgpt7_8_with_vectordb_spark.operators.webplcodec import (
        _read_prefix_code,
    )

    bw = BitWriter()
    bw.write(1, 1)  # simple
    bw.write(1, 1)  # two symbols
    bw.write(1, 1)  # first is 8-bit
    bw.write(200, 8)  # larger symbol transmitted FIRST
    bw.write(3, 8)
    bw.write(0b10, 2)  # body: code 0 then code 1 (LSB-first bits)
    br = BitReader(bw.bytes())
    dec = _read_prefix_code(br, 256)
    assert dec.decode(br) == 3  # code 0 -> min(sym0, sym1)
    assert dec.decode(br) == 200


def test_select_predictor_tie_resolves_to_top():
    """Predictor 11 (Select) on a Manhattan-distance tie returns the
    TOP pixel, matching libwebp's ``(pa - pb <= 0) ? top : left``; an
    inverted tie-break propagates through every later prediction and
    the encoder twin can't see it (both sides would share the bug)."""
    from debgpt7_8_with_vectordb_spark.operators.webplcodec import _select

    l = 0xFF0A0A0A
    t = 0xFF141414
    tl = 0xFF0F0F0F  # per-channel midpoint -> pa == pt exactly
    assert _select(l, t, tl) == t
    # non-tie sanity in both directions
    assert _select(l, t, l) == t  # tl == l -> predict t exactly
    assert _select(l, t, t) == l  # tl == t -> predict l exactly


def test_vp8l_alpha_kept_when_header_hint_unset():
    """The header alpha bit is a hint, not a mask: a stream whose
    literals carry alpha != 255 with the hint cleared must still decode
    to 4 channels (libwebp emits whatever the literals carry)."""
    rng = random.Random(77)
    w, h = 6, 5
    px = bytearray(_rand_img(rng, w, h, 4))
    px[3] = 0x40  # guarantee a non-opaque pixel
    data = bytearray(encode_vp8l(bytes(px), w, h, 4))
    # clear the alpha-hint bit: 8 (sig) + 14 (w) + 14 (h) = bit 36,
    # LSB-first -> byte 4, bit 4
    assert data[4] & 0x10, "encoder should have set the hint for RGBA"
    data[4] &= ~0x10
    got = decode_vp8l(bytes(data))
    assert got is not None
    gw, gh, ch, out = got
    assert (gw, gh, ch) == (w, h, 4)
    # full round-trip equality, RGBA order preserved
    assert bytes(out) == bytes(px)


def test_vp8l_opaque_stream_with_hint_unset_stays_rgb():
    """All-opaque literals with the hint unset keep the 3-channel
    contract (no spurious alpha channel from the hint fix)."""
    rng = random.Random(78)
    w, h = 4, 4
    px = _rand_img(rng, w, h, 3)
    got = decode_vp8l(encode_vp8l(px, w, h, 3))
    assert got is not None and got[2] == 3 and bytes(got[3]) == px
