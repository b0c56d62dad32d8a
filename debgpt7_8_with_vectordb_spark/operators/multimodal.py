"""Multimodal column plumbing — image/audio/video as opaque binary.

Design for a 100 TB media corpus: payloads live in a ``binary`` column
(or content-addressed object-store paths) beside typed metadata columns;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes cross the JVM↔Python boundary once per
batch, never per row.

Codec status (round 7): HEADER-METADATA decode is REAL for PNG / GIF /
BMP / PNM / JPEG / TIFF / WebP / WAV / MP3 / FLAC / Ogg / AIFF / AU /
MP4 / AVI / Matroska-WebM (zero-dependency struct parsers, golden-byte
pinned), and PIXEL/SAMPLE decode is REAL for the stdlib-decodable
subset — PNG 8/16-bit (zlib inflate + all five scanline filters,
paletted PLTE mapping, Adam7 interlace, high-byte 16-bit
presentation), BMP 24/32bpp uncompressed + 8bpp paletted incl. RLE8,
TIFF strips (uncompressed/PackBits), 8/16-bit PNM
P2/P3/P5/P6, GIF (from-scratch LZW + palette + interlace), JPEG both
baseline and progressive (from-scratch Huffman + IDCT + successive-
approximation scans + chroma upsample, jpegcodec.py),
WAV PCM 8/16-bit (``decode_image_pixels`` / ``decode_wav_samples``),
with feature-extract / resize / PCM-stats stages running on the decoded
content. Still honestly stubbed, because they genuinely need codec
libraries absent in this container:
- ``decode_image_stub``: lossy WebP (VP8 — metadata decodes; VP8L
  lossless pixels decode for real since round 8, webplcodec.py) and
  lossy AUDIO/VIDEO codecs (MP3 / H.264 frame decode — ffmpeg
  territory); JPEG decodes for real since round 7, baseline AND
  progressive (jpegcodec.py);
- ``fake_decode_metadata``: the deterministic md5-derived fake kept
  for the oracled plumbing query (testdata payloads are text bytes,
  not image files).
"""

from __future__ import annotations

import hashlib
import re
import struct
from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

MEDIA_SCHEMA = "doc_id long, payload binary, media_type string"
DECODED_SCHEMA = "doc_id long, n_bytes long, digest string, width int, height int"
HEADER_SCHEMA = "doc_id long, fmt string, width int, height int, n_bytes long"


_PNM_HEADER = re.compile(
    rb"^(P[1-6])\s+(?:#[^\n]*\s+)*(\d+)\s+(?:#[^\n]*\s+)*(\d+)\s"
)


def parse_image_header(payload: bytes) -> tuple[str, int, int] | None:
    """REAL image metadata decode, zero dependencies: identify the
    container from its magic bytes and read (width, height) straight
    from the header layout each format specifies. Returns
    ``(fmt, width, height)`` or None for unrecognized/truncated bytes.

    Formats whose headers are pure struct layout (no codec needed):
    - PNG: 8-byte signature, then the IHDR chunk — width/height are
      big-endian uint32 at offsets 16/20 (PNG spec §11.2.2);
    - GIF87a/GIF89a: logical-screen width/height, little-endian uint16
      at offsets 6/8 (GIF89a spec §18);
    - BMP: 'BM' magic; BITMAPINFOHEADER width/height are little-endian
      int32 at offsets 18/22 (height may be negative = top-down rows);
    - PPM/PGM/PBM (P1-P6): ASCII "<magic> <width> <height>" with
      whitespace/comment separators (Netpbm format spec);
    - JPEG: marker walk to the first SOFn frame header (works for
      progressive too — dimensions need no entropy decode);
    - TIFF: byte-order mark + first-IFD tag walk (256/257);
    - WebP: RIFF container, VP8 / VP8L / VP8X dimension layouts.

    This is the metadata half a curation pipeline actually runs at
    scale (filter by dimensions / aspect ratio BEFORE paying pixel
    decode); the pixel half lives in ``decode_image_pixels``."""
    if len(payload) >= 24 and payload[:8] == b"\x89PNG\r\n\x1a\n":
        if payload[12:16] == b"IHDR":
            w, h = struct.unpack(">II", payload[16:24])
            return "png", int(w), int(h)
        return None
    if len(payload) >= 10 and payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return "gif", int(w), int(h)
    if len(payload) >= 26 and payload[:2] == b"BM":
        hdr_size = struct.unpack("<I", payload[14:18])[0]
        if hdr_size >= 40:  # BITMAPINFOHEADER and successors
            w, h = struct.unpack("<ii", payload[18:26])
            if w <= 0:  # height<0 is legal (top-down rows); width<=0 is corrupt
                return None
            return "bmp", int(w), abs(int(h))
        if hdr_size == 12 and len(payload) >= 22:  # BITMAPCOREHEADER
            w, h = struct.unpack("<HH", payload[18:22])
            return "bmp", int(w), int(h)
        return None
    if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
        from .jpegcodec import parse_jpeg_header

        j = parse_jpeg_header(payload)
        if j is None:
            return None
        return "jpeg", j[0], j[1]
    if len(payload) >= 8 and payload[:4] in (b"II*\x00", b"MM\x00*"):
        return _parse_tiff_header(payload)
    if len(payload) >= 30 and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
        return _parse_webp_header(payload)
    m = _PNM_HEADER.match(payload)
    if m:
        return m.group(1).decode("ascii").lower(), int(m.group(2)), int(m.group(3))
    if payload[:4] == b"\x00\x00\x01\x00":
        return parse_ico_header(payload)
    if payload[:256].lstrip()[:4] in (b"<svg", b"<?xm"):
        return parse_svg_header(payload)
    return None


_TIFF_TYPE = {1: "B", 3: "H", 4: "I"}  # BYTE / SHORT / LONG


def _tiff_ifd(payload: bytes, endian: str, ifd_off: int) -> dict | None:
    """Generic first-IFD reader: tag -> list of int values for the
    integer types (BYTE/SHORT/LONG, inline or offset-stored); other
    types map to None so callers can refuse what they can't use."""
    if ifd_off + 2 > len(payload):
        return None
    (count,) = struct.unpack(endian + "H", payload[ifd_off : ifd_off + 2])
    out: dict = {}
    for i in range(count):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(payload):
            return None
        tag, typ = struct.unpack(endian + "HH", payload[off : off + 4])
        (cnt,) = struct.unpack(endian + "I", payload[off + 4 : off + 8])
        fmt = _TIFF_TYPE.get(typ)
        if fmt is None:
            out[tag] = None
            continue
        total = struct.calcsize(fmt) * cnt
        if total <= 4:
            data = payload[off + 8 : off + 8 + total]
        else:
            (p,) = struct.unpack(endian + "I", payload[off + 8 : off + 12])
            data = payload[p : p + total]
        if len(data) < total:
            return None
        out[tag] = list(struct.unpack(f"{endian}{cnt}{fmt}", data))
    return out


def _packbits_decode(data: bytes, expected: int) -> bytes | None:
    """TIFF PackBits RLE (spec §9): n in 0..127 copies n+1 literals,
    n in -127..-1 repeats the next byte 1-n times, -128 is a no-op."""
    out = bytearray()
    pos = 0
    while pos < len(data) and len(out) < expected:
        n = data[pos]
        pos += 1
        if n < 128:
            if pos + n + 1 > len(data):
                return None
            out += data[pos : pos + n + 1]
            pos += n + 1
        elif n > 128:
            if pos >= len(data):
                return None
            out += bytes([data[pos]]) * (257 - n)
            pos += 1
        # n == 128: no-op
    return bytes(out[:expected]) if len(out) >= expected else None


def _decode_tiff_pixels(payload: bytes):
    """TIFF 6.0 pixel decode for the struct-only subset: 8-bit
    gray/RGB(A), chunky planar config, strip-organized, uncompressed
    or PackBits; WhiteIsZero grayscale inverted to the normalized
    black-is-zero convention. LZW/JPEG-in-TIFF stay outside the
    subset (None)."""
    endian = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    ifd = _tiff_ifd(payload, endian, ifd_off)
    if ifd is None:
        return None

    def one(tag, default=None):
        v = ifd.get(tag, [default] if default is not None else None)
        return v[0] if v else None

    w, h = one(256), one(257)
    if not w or not h or w * h > 1 << 26:
        return None
    spp = one(277, 1)
    bits = ifd.get(258, [8])
    comp = one(259, 1)
    photo = one(262)
    planar = one(284, 1)
    rps = one(278, h) or h
    offsets = ifd.get(273)
    counts = ifd.get(279)
    if (
        spp not in (1, 3, 4) or planar != 1 or comp not in (1, 32773)
        or photo not in (0, 1, 2) or bits is None
        or any(b != 8 for b in bits) or not offsets or not counts
        or len(offsets) != len(counts)
    ):
        return None
    row_bytes = w * spp
    out = bytearray()
    rows_left = h
    for soff, scnt in zip(offsets, counts):
        rows = min(rps, rows_left)
        expected = rows * row_bytes
        body = payload[soff : soff + scnt]
        if len(body) < scnt:
            return None
        strip = body if comp == 1 else _packbits_decode(body, expected)
        if strip is None or len(strip) < expected:
            return None
        out += strip[:expected]
        rows_left -= rows
        if rows_left <= 0:
            break
    if rows_left > 0:
        return None
    if photo == 0:  # WhiteIsZero -> invert to black-is-zero
        out = bytearray(255 - v for v in out)
    return "tiff", int(w), int(h), int(spp), bytes(out)


def encode_test_tiff_pixels(
    width: int,
    height: int,
    pixels: bytes,
    spp: int = 3,
    packbits: bool = False,
    big_endian: bool = False,
    rows_per_strip: int | None = None,
    white_is_zero: bool = False,
) -> bytes:
    """Forward TIFF writer (fixture oracle): strip-organized 8-bit
    chunky layout, optional PackBits compression (independent run
    encoder), either byte order, multi-strip via rows_per_strip."""
    e = ">" if big_endian else "<"
    rps = rows_per_strip or height
    strips = []
    for y0 in range(0, height, rps):
        rows = min(rps, height - y0)
        raw = pixels[y0 * width * spp : (y0 + rows) * width * spp]
        if white_is_zero and spp == 1:
            raw = bytes(255 - v for v in raw)
        if packbits:
            enc = bytearray()
            i = 0
            while i < len(raw):
                run = 1
                while (
                    i + run < len(raw) and raw[i + run] == raw[i] and run < 127
                ):
                    run += 1
                if run >= 2:
                    enc += bytes([257 - run, raw[i]])
                    i += run
                else:
                    lit = i
                    while (
                        i < len(raw) and i - lit < 128
                        and not (
                            i + 2 < len(raw)
                            and raw[i] == raw[i + 1] == raw[i + 2]
                        )
                    ):
                        i += 1
                    enc += bytes([i - lit - 1]) + raw[lit:i]
            strips.append(bytes(enc))
        else:
            strips.append(raw)
    photo = 0 if (white_is_zero and spp == 1) else (1 if spp == 1 else 2)
    n_entries = 9
    ifd_off = 8
    data_off = ifd_off + 2 + 12 * n_entries + 4
    # strip offset/count arrays (LONG) live right after the IFD
    arr_bytes = 0 if len(strips) == 1 else 4 * len(strips) * 2
    strip0 = data_off + arr_bytes
    offs, pos = [], strip0
    for s in strips:
        offs.append(pos)
        pos += len(s)

    def entry(tag, typ, cnt, value_bytes):
        return struct.pack(e + "HHI", tag, typ, cnt) + value_bytes

    def long_inline(v):
        return struct.pack(e + "I", v)

    def short_inline(v):
        return struct.pack(e + "HH", v, 0)

    if len(strips) == 1:
        off_entry = entry(273, 4, 1, long_inline(offs[0]))
        cnt_entry = entry(279, 4, 1, long_inline(len(strips[0])))
        tail = b""
    else:
        off_entry = entry(273, 4, len(strips), long_inline(data_off))
        cnt_entry = entry(
            279, 4, len(strips), long_inline(data_off + 4 * len(strips))
        )
        tail = b"".join(struct.pack(e + "I", o) for o in offs)
        tail += b"".join(struct.pack(e + "I", len(s)) for s in strips)
    entries = (
        entry(256, 4, 1, long_inline(width))
        + entry(257, 4, 1, long_inline(height))
        + entry(258, 3, 1, short_inline(8))
        + entry(259, 3, 1, short_inline(32773 if packbits else 1))
        + entry(262, 3, 1, short_inline(photo))
        + off_entry
        + entry(277, 3, 1, short_inline(spp))
        + entry(278, 4, 1, long_inline(rps))
        + cnt_entry
    )
    bom = b"MM\x00*" if big_endian else b"II*\x00"
    return (
        bom + struct.pack(e + "I", ifd_off)
        + struct.pack(e + "H", n_entries) + entries + struct.pack(e + "I", 0)
        + tail + b"".join(strips)
    )


def _parse_tiff_header(payload: bytes):
    """TIFF 6.0: endianness from the byte-order mark, first IFD walk,
    ImageWidth (256) / ImageLength (257) as SHORT or LONG inline
    values. Multi-page files report the first directory — the
    filter-by-dimensions contract, not a full tag decode."""
    endian = "<" if payload[:2] == b"II" else ">"
    (ifd_off,) = struct.unpack(endian + "I", payload[4:8])
    if ifd_off + 2 > len(payload):
        return None
    (count,) = struct.unpack(endian + "H", payload[ifd_off : ifd_off + 2])
    w = h = None
    for i in range(count):
        off = ifd_off + 2 + 12 * i
        if off + 12 > len(payload):
            return None
        tag, typ = struct.unpack(endian + "HH", payload[off : off + 4])
        if tag in (256, 257):
            if typ == 3:  # SHORT: value left-justified in the 4-byte slot
                (v,) = struct.unpack(endian + "H", payload[off + 8 : off + 10])
            elif typ == 4:  # LONG
                (v,) = struct.unpack(endian + "I", payload[off + 8 : off + 12])
            else:
                return None
            if tag == 256:
                w = v
            else:
                h = v
    if not w or not h:
        return None
    return "tiff", int(w), int(h)


def _parse_webp_header(payload: bytes):
    """WebP (RIFF container): VP8 lossy (start code + 14-bit dims),
    VP8L lossless (0x2F signature + 14-bit minus-one dims), VP8X
    extended (24-bit minus-one canvas dims)."""
    tag = payload[12:16]
    if tag == b"VP8 ":
        if payload[23:26] != b"\x9d\x01\x2a":  # keyframe start code
            return None
        w = struct.unpack("<H", payload[26:28])[0] & 0x3FFF
        h = struct.unpack("<H", payload[28:30])[0] & 0x3FFF
    elif tag == b"VP8L":
        if payload[20] != 0x2F:
            return None
        bits = int.from_bytes(payload[21:25], "little")
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
    elif tag == b"VP8X":
        w = int.from_bytes(payload[24:27], "little") + 1
        h = int.from_bytes(payload[27:30], "little") + 1
    else:
        return None
    if not w or not h:
        return None
    return "webp", int(w), int(h)


def _parse_or_none(parser, payload: bytes):
    """NULL-on-unrecognized contract holds for MALFORMED input too: a
    truncated/corrupt container must yield a NULL-metadata row, never an
    exception — an uncaught struct.error in a mapInPandas stage kills the
    whole task, and at 100 TB of scraped media malformed files are the
    expected case, not the exception."""
    try:
        return parser(payload)
    except Exception:
        return None


def decode_image_metadata(media: DataFrame) -> DataFrame:
    """The REAL header-decode stage: Arrow-batched ``mapInPandas`` over
    binary payloads → (fmt, width, height, n_bytes), parsing actual
    container headers via ``parse_image_header``. Unrecognized payloads
    yield fmt NULL (kept, not dropped — a curation pipeline routes
    them to quarantine rather than silently losing rows). Same batch
    shape and partition-preserving plumbing as ``fake_decode_metadata``;
    only the codec differs."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            parsed = [_parse_or_none(parse_image_header, p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [t[0] if t else None for t in parsed],
                    "width": pd.array(
                        [t[1] if t else None for t in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [t[2] if t else None for t in parsed], dtype="Int32"
                    ),
                    "n_bytes": [len(p) for p in payloads],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema=HEADER_SCHEMA
    )


def encode_test_image(fmt: str, width: int, height: int) -> bytes:
    """Minimal VALID image bytes for the given container — the writer
    half used by the oracled round-trip query and the golden-byte
    tests. Writers are independent of ``parse_image_header`` (struct
    layouts written forward from the specs, not by inverting the
    parser); pixel payloads are the smallest legal filler."""
    if fmt == "png":
        import zlib

        ihdr = struct.pack(">II", width, height) + b"\x08\x00\x00\x00\x00"

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body))
                + tag
                + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        # one grayscale scanline per row: filter byte + width zeros
        raw = (b"\x00" + b"\x00" * width) * height
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
    if fmt == "gif":
        return (
            b"GIF89a"
            + struct.pack("<HH", width, height)
            + b"\x00\x00\x00"  # no GCT, bg 0, aspect 0
            + b"\x3b"  # trailer
        )
    if fmt == "bmp":
        row = (width * 3 + 3) // 4 * 4  # 24bpp rows pad to 4 bytes
        pix = b"\x00" * (row * height)
        info = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
        )
        off = 14 + 40
        hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        return hdr + info + pix
    if fmt == "ppm":
        hdr = f"P6 {width} {height} 255\n".encode("ascii")
        return hdr + b"\x00" * (3 * width * height)
    if fmt == "jpeg":
        # SOI + single-component SOF0 + EOI: dimensions live in the
        # frame header, which is all the metadata walk needs
        return (
            b"\xff\xd8\xff\xc0"
            + struct.pack(">HBHHB", 11, 8, height, width, 1)
            + bytes([1, 0x11, 0])
            + b"\xff\xd9"
        )
    if fmt == "tiff":
        return encode_test_tiff(width, height)
    if fmt == "webp":
        return encode_test_webp("vp8l", width, height)
    if fmt == "ico":
        # one 32bpp DIB frame: BITMAPINFOHEADER with DOUBLED height
        # (XOR + AND masks per the ICO convention)
        xor = b"\x00" * (width * 4 * height)
        and_row = (width + 31) // 32 * 4
        mask = b"\x00" * (and_row * height)
        dib = (
            struct.pack(
                "<IiiHHIIiiII", 40, width, 2 * height, 1, 32, 0,
                len(xor) + len(mask), 0, 0, 0, 0,
            )
            + xor
            + mask
        )
        entry = struct.pack(
            "<BBBBHHII", width % 256, height % 256, 0, 0, 1, 32,
            len(dib), 6 + 16,
        )
        return struct.pack("<HHH", 0, 1, 1) + entry + dib
    raise ValueError(f"unknown test-image format: {fmt}")


def attach_binary_payload(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Fabricate an opaque binary payload column (UTF-8 bytes of the text
    stand in for image bytes; real pipelines read format('binaryFile'))."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(text_col).cast("binary").alias("payload"),
        F.lit("image/fake").alias("media_type"),
    )


def decode_image_stub(payload: bytes) -> object:
    """Codec-library decoder entry point. Since round 7 the
    zero-dependency subset has a REAL default: PNG 8-bit, BMP 24/32bpp,
    PNM, GIF incl. LZW+interlace, baseline+progressive JPEG
    (``operators/jpegcodec.py``) and — round 8 — lossless WebP/VP8L
    (``operators/webplcodec.py``) in ``decode_image_pixels``; WAV PCM
    in ``decode_wav_samples``. This stub now covers only formats that
    genuinely require codec libraries absent in this container: lossy
    WebP (VP8 intra frames), lossy audio/video frame decode
    (MP3 / H.264 / ...) and the rare non-Huffman JPEG variants
    (arithmetic-coded / lossless / hierarchical)."""
    raise NotImplementedError(
        "VP8/MP3/H.264 lossy-frame decode requires ffmpeg-class codecs; "
        "wire the real codec here in production — JPEG "
        "(baseline + progressive) and lossless formats are handled by "
        "decode_image_pixels/decode_wav_samples"
    )


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake dimensions from the payload hash (matches the
    md5-as-BIGINT convention in functions/hashing.py, so a SQL oracle can
    reproduce it)."""
    h = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return 16 + h % 240, 16 + (h // 240) % 240


def fake_decode_metadata(media: DataFrame) -> DataFrame:
    """The decode stage: Arrow-batched mapInPandas over binary payloads →
    typed metadata. Swap ``_fake_dims`` for a real codec in production;
    the schema, partitioning, and batch shape are the real article."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            dims = [_fake_dims(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "digest": [hashlib.md5(p).hexdigest() for p in payloads],
                    "width": [w for w, _ in dims],
                    "height": [h for _, h in dims],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(decode, schema=DECODED_SCHEMA)


AUDIO_SCHEMA = (
    "doc_id long, fmt string, channels int, sample_rate int, "
    "bits int, n_samples long"
)


def parse_wav_header(
    payload: bytes,
) -> tuple[str, int, int, int, int] | None:
    """REAL audio metadata decode, zero dependencies: RIFF/WAVE chunk
    walk (RIFF spec / RFC 2361). Returns (fmt, channels, sample_rate,
    bits_per_sample, n_samples) or None. The fmt chunk is pure struct
    layout; n_samples = data-chunk bytes / block-align. This is the
    metadata half a curation pipeline filters on (sample rate,
    channels, duration) before paying codec decode — which stays
    honestly stubbed (no audio libs in this container)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        return None
    pos, n = 12, len(payload)
    channels = rate = bits = block = None
    data_size = None
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + size]
        if tag == b"fmt " and len(body) >= 16:
            _fmt, channels, rate, _br, block, bits = struct.unpack(
                "<HHIIHH", body[:16]
            )
        elif tag == b"data":
            data_size = size
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if channels is None or data_size is None or not block:
        return None
    return "wav", int(channels), int(rate), int(bits), data_size // block


def decode_audio_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched audio-header decode stage — the audio twin of
    ``decode_image_metadata``. Dispatches on container magic: WAV RIFF
    walk here, MP3 frame walk / FLAC STREAMINFO / Ogg Vorbis+Opus in
    ``audio_headers`` (all zero-dep struct parsers). Unrecognized
    payloads keep the row with NULL fields; ``bits`` is NULL for lossy
    codecs that have no PCM width."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .audio_headers import parse_audio_header

        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            parsed = [_parse_or_none(parse_audio_header, p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [t[0] if t else None for t in parsed],
                    "channels": pd.array(
                        [t[1] if t else None for t in parsed], dtype="Int32"
                    ),
                    "sample_rate": pd.array(
                        [t[2] if t else None for t in parsed], dtype="Int32"
                    ),
                    "bits": pd.array(
                        [t[3] if t else None for t in parsed], dtype="Int32"
                    ),
                    "n_samples": pd.array(
                        [t[4] if t else None for t in parsed], dtype="Int64"
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema=AUDIO_SCHEMA
    )


def encode_test_wav(
    channels: int, sample_rate: int, bits: int, n_samples: int
) -> bytes:
    """Minimal valid PCM WAV (written forward from the RIFF spec,
    independent of the parser) — silence payload."""
    block = channels * (bits // 8)
    data = b"\x00" * (n_samples * block)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def synthesize_test_media(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Fabricate REAL image payloads (valid PNG/GIF/BMP/PPM/JPEG/TIFF/
    WebP/ICO containers — the full round-7 parse_image_header breadth,
    widened per VERDICT r7 #4 — format and dimensions derived from the
    id by fixed arithmetic): the writer half of the oracled decode
    round-trip. The engine encodes real bytes and parses them back with
    the independent header parser, while the SQL oracle predicts the
    parsed metadata from the same arithmetic without touching bytes.
    Dimensions stay <= 32 so the Arrow batches carry a few KB per row."""
    fmts = ("png", "gif", "bmp", "ppm", "jpeg", "tiff", "webp", "ico")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_int = [int(i) for i in pdf[id_col]]
            payloads = [
                encode_test_image(fmts[i % 8], 1 + i % 32, 1 + (i * 7) % 32)
                for i in ids_int
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": [
                        "image/" + fmts[i % 8] for i in ids_int
                    ],
                }
            )

    return ids.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


VIDEO_SCHEMA = (
    "doc_id long, fmt string, timescale int, duration long, "
    "width int, height int, n_tracks int"
)


def _iter_boxes(data: bytes, pos: int, end: int):
    """Yield (type, body_start, body_end) for ISO BMFF boxes in
    data[pos:end]; tolerates 64-bit largesize boxes and stops on a
    malformed size."""
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = pos + 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                return
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            body = pos + 16
        elif size == 0:  # box extends to EOF
            size = end - pos
        if size < 8 or pos + size > end:
            return
        yield tag, body, pos + size
        pos += size


def parse_mp4_header(
    payload: bytes,
) -> tuple[str, int, int, int, int, int] | None:
    """REAL video metadata decode, zero dependencies: ISO BMFF
    (MP4/MOV) box walk — ftyp to identify, moov/mvhd for timescale +
    duration (version 0 and 1 layouts), moov/trak/tkhd for the
    presentation width/height (16.16 fixed point) and track count
    (ISO/IEC 14496-12 §8.2.2, §8.3.2). Returns (fmt, timescale,
    duration, width, height, n_tracks) or None. Duration stays in
    timescale units (integer-exact — seconds are a downstream
    division). Frame/sample DECODE stays stubbed (no codecs here);
    this is the filter-by-duration/resolution metadata pass."""
    n = len(payload)
    if n < 12 or payload[4:8] != b"ftyp":
        return None
    timescale = duration = None
    width = height = 0
    n_tracks = 0
    for tag, b, e in _iter_boxes(payload, 0, n):
        if tag != b"moov":
            continue
        for t2, b2, e2 in _iter_boxes(payload, b, e):
            if t2 == b"mvhd" and e2 - b2 >= 20:
                ver = payload[b2]
                if ver == 1:
                    # v1 body needs 32 bytes (64-bit times); a shorter
                    # one is malformed — skip rather than misread the
                    # v0 offsets or run past the box end
                    if e2 - b2 >= 32:
                        timescale = struct.unpack(
                            ">I", payload[b2 + 20 : b2 + 24]
                        )[0]
                        duration = struct.unpack(
                            ">Q", payload[b2 + 24 : b2 + 32]
                        )[0]
                else:
                    timescale = struct.unpack(">I", payload[b2 + 12 : b2 + 16])[0]
                    duration = struct.unpack(">I", payload[b2 + 16 : b2 + 20])[0]
            elif t2 == b"trak":
                n_tracks += 1
                for t3, b3, e3 in _iter_boxes(payload, b2, e2):
                    if t3 == b"tkhd" and e3 - b3 >= 4:
                        ver = payload[b3]
                        # fullbox(4) + v0: times/id/reserved/duration =
                        # 20; v1: 64-bit times/duration = 32
                        off = b3 + 4 + (20 if ver == 0 else 32)
                        # then reserved(8) layer(2) altgroup(2)
                        # volume(2) reserved(2) matrix(36) w(4) h(4)
                        wh = off + 8 + 2 + 2 + 2 + 2 + 36
                        if wh + 8 <= e3:
                            w169, h169 = struct.unpack(
                                ">II", payload[wh : wh + 8]
                            )
                            width = max(width, w169 >> 16)
                            height = max(height, h169 >> 16)
    if timescale is None:
        return None
    return "mp4", int(timescale), int(duration), width, height, n_tracks


def parse_avi_header(
    payload: bytes,
) -> tuple[str, int, int, int, int, int] | None:
    """REAL AVI metadata decode: RIFF 'AVI ' chunk walk to the avih
    main header (OpenDML / AVI RIFF spec). Reports the VIDEO_SCHEMA
    shape with timescale fixed at 1_000_000 (avih counts microseconds
    per frame, so duration = usec_per_frame * total_frames stays
    integer-exact in timescale units, matching the mvhd contract)."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        return None

    def find_avih(pos: int, end: int):
        while pos + 8 <= end:
            tag = payload[pos : pos + 4]
            (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
            if tag == b"LIST" and payload[pos + 8 : pos + 12] == b"hdrl":
                hit = find_avih(pos + 12, min(end, pos + 8 + size))
                if hit is not None:
                    return hit
            elif tag == b"avih" and size >= 40 and pos + 48 <= end:
                return payload[pos + 8 : pos + 48]
            pos += 8 + size + (size & 1)  # chunks are word-aligned
        return None

    body = find_avih(12, len(payload))
    if body is None:
        return None
    usec_pf, _, _, _, total_frames, _, streams, _, w, h = struct.unpack(
        "<10I", body
    )
    if not w or not h or not usec_pf:
        return None
    return "avi", 1_000_000, usec_pf * total_frames, int(w), int(h), int(streams)


def _ebml_vint(payload: bytes, pos: int):
    """Read one EBML variable-length integer. Returns
    (value_with_marker, value_without_marker, length) or None."""
    if pos >= len(payload):
        return None
    b0 = payload[pos]
    if b0 == 0:
        return None  # >8-byte vints are outside the Matroska profile
    length = 9 - b0.bit_length()
    if pos + length > len(payload):
        return None
    raw = b0
    stripped = b0 & ((1 << (8 - length)) - 1)
    for i in range(1, length):
        raw = (raw << 8) | payload[pos + i]
        stripped = (stripped << 8) | payload[pos + i]
    return raw, stripped, length


def _ebml_children(payload: bytes, pos: int, end: int):
    """Yield (element_id, body_start, body_end) for one EBML level.
    Unknown-size elements (all value bits set — streamed Segments)
    run to the enclosing end, per the EBML spec."""
    while pos < end:
        head = _ebml_vint(payload, pos)
        if head is None:
            return
        eid, _, id_len = head
        size_f = _ebml_vint(payload, pos + id_len)
        if size_f is None:
            return
        _, size, size_len = size_f
        body_start = pos + id_len + size_len
        if size == (1 << (7 * size_len)) - 1:  # unknown size
            body_end = end
        else:
            body_end = body_start + size
            if body_end > end:
                return
        yield eid, body_start, body_end
        pos = body_end


def parse_mkv_header(
    payload: bytes,
) -> tuple[str, int, int | None, int, int, int] | None:
    """REAL Matroska/WebM metadata decode: EBML walk to Segment >
    Info (TimestampScale, Duration) and Tracks > TrackEntry > Video
    (PixelWidth/PixelHeight). Reports VIDEO_SCHEMA shape: timescale =
    ticks/second derived from TimestampScale (default 1 ms ticks),
    duration in ticks (Matroska stores it as a float — rounded to the
    integer tick; None when the file carries no Duration, e.g. live
    remuxes), n_tracks = TrackEntry count. Files without a Video
    element are not videos for this stage's purpose -> None."""
    if payload[:4] != b"\x1aE\xdf\xa3":
        return None
    doctype = "matroska"
    ts_scale = 1_000_000  # nanoseconds per tick (spec default)
    duration = None
    width = height = None
    n_tracks = 0
    for eid, b0, b1 in _ebml_children(payload, 0, len(payload)):
        if eid == 0x1A45DFA3:  # EBML header
            for eid2, c0, c1 in _ebml_children(payload, b0, b1):
                if eid2 == 0x4282:  # DocType
                    doctype = (
                        payload[c0:c1].split(b"\x00")[0].decode("ascii", "replace")
                    )
        elif eid == 0x18538067:  # Segment
            for eid2, c0, c1 in _ebml_children(payload, b0, b1):
                if eid2 == 0x1549A966:  # Info
                    for eid3, d0, d1 in _ebml_children(payload, c0, c1):
                        if eid3 == 0x2AD7B1:
                            ts_scale = int.from_bytes(payload[d0:d1], "big")
                        elif eid3 == 0x4489:  # Duration (float32/64)
                            raw = payload[d0:d1]
                            if len(raw) == 4:
                                duration = struct.unpack(">f", raw)[0]
                            elif len(raw) == 8:
                                duration = struct.unpack(">d", raw)[0]
                elif eid2 == 0x1654AE6B:  # Tracks
                    for eid3, d0, d1 in _ebml_children(payload, c0, c1):
                        if eid3 != 0xAE:  # TrackEntry
                            continue
                        n_tracks += 1
                        for eid4, e0, e1 in _ebml_children(payload, d0, d1):
                            if eid4 != 0xE0:  # Video
                                continue
                            for eid5, f0, f1 in _ebml_children(payload, e0, e1):
                                if eid5 == 0xB0:
                                    width = int.from_bytes(payload[f0:f1], "big")
                                elif eid5 == 0xBA:
                                    height = int.from_bytes(payload[f0:f1], "big")
    if not ts_scale or not width or not height or not n_tracks:
        return None
    fmt = "webm" if doctype == "webm" else "mkv"
    timescale = round(1_000_000_000 / ts_scale)
    ticks = None if duration is None else round(duration)
    return fmt, timescale, ticks, int(width), int(height), n_tracks


def parse_video_header(payload: bytes):
    """Container dispatch for the video metadata stage: ISO BMFF / MP4
    box walk, AVI RIFF walk, or Matroska/WebM EBML walk."""
    if payload[:4] == b"RIFF":
        return parse_avi_header(payload)
    if payload[:4] == b"\x1aE\xdf\xa3":
        return parse_mkv_header(payload)
    return parse_mp4_header(payload)


def decode_video_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched video-header decode stage — the video third of
    the metadata trio (MP4 box walk + AVI RIFF walk); unrecognized
    payloads keep the row with NULLs."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            parsed = [_parse_or_none(parse_video_header, p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [t[0] if t else None for t in parsed],
                    "timescale": pd.array(
                        [t[1] if t else None for t in parsed], dtype="Int32"
                    ),
                    "duration": pd.array(
                        [t[2] if t else None for t in parsed], dtype="Int64"
                    ),
                    "width": pd.array(
                        [t[3] if t else None for t in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [t[4] if t else None for t in parsed], dtype="Int32"
                    ),
                    "n_tracks": pd.array(
                        [t[5] if t else None for t in parsed], dtype="Int32"
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema=VIDEO_SCHEMA
    )


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


def encode_test_mp4(
    timescale: int, duration: int, width: int, height: int, n_tracks: int = 1
) -> bytes:
    """Minimal valid ISO BMFF skeleton (written forward from
    ISO/IEC 14496-12, independent of the parser): ftyp + moov holding a
    version-0 mvhd and n_tracks tkhd-bearing traks."""
    mvhd = (
        b"\x00\x00\x00\x00"  # version 0 + flags
        + struct.pack(">II", 0, 0)  # ctime mtime
        + struct.pack(">II", timescale, duration)
        + struct.pack(">I", 0x00010000)  # rate 1.0
        + struct.pack(">H", 0x0100)  # volume 1.0
        + b"\x00" * 10  # reserved
        + b"\x00" * 36  # identity matrix slot (zeros fine for parse)
        + b"\x00" * 24  # pre_defined
        + struct.pack(">I", n_tracks + 1)  # next_track_ID
    )
    tkhd = (
        b"\x00\x00\x00\x07"  # version 0 + flags (enabled)
        + struct.pack(">IIII", 0, 0, 1, 0)  # ctime mtime track_id reserved
        + struct.pack(">I", duration)
        + b"\x00" * 8  # reserved
        + struct.pack(">HHHH", 0, 0, 0, 0)  # layer altgroup volume reserved
        + b"\x00" * 36  # matrix
        + struct.pack(">II", width << 16, height << 16)
    )
    traks = b"".join(_box(b"trak", _box(b"tkhd", tkhd)) for _ in range(n_tracks))
    return _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2") + _box(
        b"moov", _box(b"mvhd", mvhd) + traks
    )


def encode_test_avi(
    usec_per_frame: int,
    total_frames: int,
    width: int,
    height: int,
    streams: int = 1,
) -> bytes:
    """Minimal valid AVI skeleton (written forward from the AVI RIFF
    spec, independent of the parser): RIFF 'AVI ' + LIST hdrl + avih."""
    avih = struct.pack(
        "<10I", usec_per_frame, 0, 0, 0, total_frames, 0, streams, 0, width, height
    ) + b"\x00" * 16  # dwScale..dwLength reserved tail
    hdrl = b"hdrl" + b"avih" + struct.pack("<I", len(avih)) + avih
    body = b"AVI " + b"LIST" + struct.pack("<I", len(hdrl)) + hdrl
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_test_tiff(width: int, height: int, big_endian: bool = False) -> bytes:
    """Minimal valid TIFF: byte-order mark + one IFD carrying
    ImageWidth (SHORT) and ImageLength (LONG) — the two layouts the
    parser must distinguish."""
    e = ">" if big_endian else "<"
    bom = b"MM\x00*" if big_endian else b"II*\x00"
    ifd = struct.pack(e + "H", 2)
    # SHORT values are left-justified within the 4-byte value slot
    ifd += struct.pack(e + "HHI", 256, 3, 1) + struct.pack(e + "HH", width, 0)
    ifd += struct.pack(e + "HHII", 257, 4, 1, height)
    ifd += struct.pack(e + "I", 0)  # next-IFD terminator
    return bom + struct.pack(e + "I", 8) + ifd


def encode_test_webp(kind: str, width: int, height: int) -> bytes:
    """Minimal valid WebP headers for all three chunk layouts."""
    if kind == "vp8":
        chunk = (
            b"\x00\x00\x00"  # frame tag (keyframe, version 0)
            + b"\x9d\x01\x2a"
            + struct.pack("<HH", width, height)
            + b"\x00" * 8
        )
        tag = b"VP8 "
    elif kind == "vp8l":
        bits = (width - 1) | ((height - 1) << 14)
        chunk = b"\x2f" + struct.pack("<I", bits) + b"\x00" * 8
        tag = b"VP8L"
    elif kind == "vp8x":
        chunk = (
            b"\x00" * 4
            + (width - 1).to_bytes(3, "little")
            + (height - 1).to_bytes(3, "little")
        )
        tag = b"VP8X"
    else:
        raise ValueError(f"unknown webp chunk kind: {kind}")
    body = b"WEBP" + tag + struct.pack("<I", len(chunk)) + chunk
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _ebml_el(eid: bytes, body: bytes, unknown_size: bool = False) -> bytes:
    """One EBML element: raw id + size vint (or the 1-byte unknown-size
    marker for streamed Segments) + body."""
    if unknown_size:
        return eid + b"\xff" + body
    for length in range(1, 9):
        if len(body) < (1 << (7 * length)) - 1:
            size = ((1 << (7 * length)) | len(body)).to_bytes(length, "big")
            return eid + size + body
    raise ValueError("EBML body too large")


def encode_test_mkv(
    doctype: str,
    width: int,
    height: int,
    ts_scale_ns: int | None = 1_000_000,
    duration_ticks: float | None = 10_000,
    n_tracks: int = 1,
    streamed: bool = False,
) -> bytes:
    """Minimal valid Matroska/WebM skeleton (written forward from the
    EBML + Matroska specs, independent of the parser). ``streamed``
    emits the Segment with the unknown-size marker; None parameters
    omit their optional elements (spec defaults apply)."""
    header = _ebml_el(b"\x1aE\xdf\xa3", _ebml_el(b"\x42\x82", doctype.encode()))
    info_body = b""
    if ts_scale_ns is not None:
        info_body += _ebml_el(b"\x2a\xd7\xb1", ts_scale_ns.to_bytes(4, "big"))
    if duration_ticks is not None:
        info_body += _ebml_el(b"\x44\x89", struct.pack(">d", float(duration_ticks)))
    info = _ebml_el(b"\x15\x49\xa9\x66", info_body)
    video = _ebml_el(
        b"\xe0",
        _ebml_el(b"\xb0", int(width).to_bytes(2, "big"))
        + _ebml_el(b"\xba", int(height).to_bytes(2, "big")),
    )
    entries = _ebml_el(b"\xae", video)
    for _ in range(n_tracks - 1):  # audio/subtitle tracks: no Video child
        entries += _ebml_el(b"\xae", _ebml_el(b"\xd7", b"\x02"))
    tracks = _ebml_el(b"\x16\x54\xae\x6b", entries)
    segment = _ebml_el(b"\x18\x53\x80\x67", info + tracks, unknown_size=streamed)
    return header + segment


def synthesize_test_audio(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Audio twin of ``synthesize_test_media``: real (minimal, silent)
    containers with parameters derived from the id by fixed arithmetic,
    for the oracled decode round-trip. Round 8 widens the rotation from
    WAV-only to the zero-dep parser breadth — WAV / AIFF / Sun .au /
    FLAC — mirroring the image-side widening (VERDICT r7 #4). Note the
    per-format frame-count CONVENTIONS the oracle must replay: WAV and
    FLAC headers count frames; AIFF and .au report total interleaved
    samples (frames x channels)."""
    from .audio_headers import encode_test_aiff, encode_test_au, encode_test_flac

    fmts = ("wav", "aiff", "au", "flac")
    rates = (8000, 16000, 22050, 44100)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_int = [int(i) for i in pdf[id_col]]
            payloads = []
            for i in ids_int:
                fmt = fmts[i % 4]
                ch = 1 + i % 2
                rate = rates[(i // 4) % 4]
                bits = 8 * (1 + (i // 2) % 2)
                frames = 1 + i % 50
                if fmt == "wav":
                    payloads.append(
                        encode_test_wav(ch, rate, bits, frames)
                    )
                elif fmt == "aiff":
                    payloads.append(
                        encode_test_aiff(ch, rate, bits, [0] * (frames * ch))
                    )
                elif fmt == "au":
                    payloads.append(
                        encode_test_au(ch, rate, bits, [0] * (frames * ch))
                    )
                else:
                    payloads.append(encode_test_flac(ch, rate, bits, frames))
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": [
                        "audio/" + fmts[i % 4] for i in ids_int
                    ],
                }
            )

    return ids.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_test_video(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Video third of the synthesize family: minimal valid skeletons
    with parameters by id arithmetic. Round 8 widens the rotation from
    ISO BMFF-only to the parser breadth — MP4 / AVI RIFF / Matroska /
    WebM — mirroring the image/audio widenings. Per-format timescale
    conventions the oracle replays: MP4 carries an explicit mvhd
    timescale; AVI reports the microsecond clock (1e6) with duration =
    usec-per-frame x frames; Matroska/WebM report ticks/second from
    TimestampScale (1e9/1e6 ns = 1000) with the float Duration as
    ticks."""
    fmts = ("mp4", "avi", "mkv", "webm")
    scales = (600, 1000, 48000, 90000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_int = [int(i) for i in pdf[id_col]]
            payloads = []
            for i in ids_int:
                fmt = fmts[i % 4]
                w, h = 320 + (i % 16) * 8, 240 + (i % 16) * 8
                tracks = 1 + i % 3
                if fmt == "mp4":
                    payloads.append(
                        encode_test_mp4(
                            timescale=scales[(i // 4) % 4],
                            duration=1000 + i * 37,
                            width=w, height=h, n_tracks=tracks,
                        )
                    )
                elif fmt == "avi":
                    payloads.append(
                        encode_test_avi(
                            usec_per_frame=1000 * (1 + i % 4),
                            total_frames=100 + i % 50,
                            width=w, height=h, streams=tracks,
                        )
                    )
                else:
                    payloads.append(
                        encode_test_mkv(
                            "matroska" if fmt == "mkv" else "webm",
                            w, h,
                            ts_scale_ns=1_000_000,
                            duration_ticks=1000 + i * 37,
                            n_tracks=tracks,
                        )
                    )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": [
                        "video/" + fmts[i % 4] for i in ids_int
                    ],
                }
            )

    return ids.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def frame_sample_stub(media: DataFrame, every_nth: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: one row per sampled frame index.
    Frame decode itself is stubbed (no ffmpeg here); the fan-out schema
    and per-payload explode are real."""
    n_frames = (F.octet_length("payload") % 100 + 1).alias("n_frames")
    return (
        media.select("doc_id", n_frames)
        .select(
            "doc_id",
            F.explode(
                F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_nth))
            ).alias("frame_idx"),
        )
    )


# ---------------------------------------------------------------------------
# PIXEL / PCM decode — round 7: the content half of the codec seam.
#
# The r6 header codecs answered "what is this file" (format, dims, rate)
# with zero dependencies; these decoders answer "what are the bytes" for
# every format whose PIXEL/SAMPLE layout is pure stdlib territory:
#   - PNG 8-bit gray/RGB/gray+alpha/RGBA, non-interlaced (zlib inflate
#     + the five scanline filters incl. Paeth, PNG spec §9);
#   - BMP 24/32bpp uncompressed BI_RGB (bottom-up padded rows, BGR(A)
#     order normalized to RGB(A));
#   - PNM P5/P6 binary and P2/P3 ASCII, maxval <= 255;
#   - WAV PCM 8-bit unsigned / 16-bit signed LE samples.
# GIF pixels (LZW + palette + interlace) and JPEG — baseline AND
# progressive (jpegcodec.py) — decode for real too; only lossy
# audio/video codecs (MP3/H.264) stay behind ``decode_image_stub``.
#
# Perf note for 100 TB: the per-byte unfilter loops below are the
# stdlib-only fallback; in production the decoder slot is the same
# injectable seam as pypdf (readers.default_pdf_decoder) — swap in
# PIL/numpy when present. Payload sizes in the oracled path stay <= 32x32
# so the Arrow batches carry a few KB per row either way.
# ---------------------------------------------------------------------------


def _png_unfilter(
    raw: bytes, width: int, height: int, bpp: int, pos: int = 0
) -> tuple[bytes, int] | None:
    """Reverse the PNG scanline filters (types 0-4, spec §9.2) over
    ``height`` scanlines starting at ``raw[pos]``; returns
    ``(pixel_bytes, next_pos)`` or None on a malformed filter byte /
    short stream. The offset form lets Adam7 interlacing unfilter each
    reduced-pass image from the same inflated stream."""
    stride = width * bpp
    if len(raw) - pos < height * (stride + 1):
        return None
    out = bytearray()
    prev = bytes(stride)
    for _y in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(bpp, stride):
                line[i] = (line[i] + line[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                line[i] = (line[i] + ((a + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        elif ftype != 0:
            return None
        out += line
        prev = bytes(line)
    return bytes(out), pos


# Adam7 pass grid: (x_start, y_start, x_step, y_step) — spec §4.5.2
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_deinterlace(raw: bytes, w: int, h: int, bpp: int) -> bytes | None:
    """Adam7: seven reduced images, each independently filtered, in one
    inflated stream; unfilter each pass and scatter its pixels to the
    full-image grid positions."""
    out = bytearray(w * h * bpp)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        res = _png_unfilter(raw, pw, ph, bpp, pos)
        if res is None:
            return None
        sub, pos = res
        for py in range(ph):
            for px in range(pw):
                src = (py * pw + px) * bpp
                dst = ((y0 + py * dy) * w + (x0 + px * dx)) * bpp
                out[dst : dst + bpp] = sub[src : src + bpp]
    return bytes(out)


def _png_deinterlace_packed(
    raw: bytes, w: int, h: int, depth: int
) -> bytes | None:
    """Adam7 for sub-byte depths (1/2/4-bit gray or palette): each pass
    packs ITS OWN rows MSB-first, so unfilter over the packed bytes
    (bpp = 1), unpack per pass row, scatter samples (one byte per
    sample) to the full grid."""
    out = bytearray(w * h)
    mask = (1 << depth) - 1
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw == 0 or ph == 0:
            continue
        row_bytes = (pw * depth + 7) // 8
        res = _png_unfilter(raw, row_bytes, ph, 1, pos)
        if res is None:
            return None
        sub, pos = res
        for py in range(ph):
            row = sub[py * row_bytes : (py + 1) * row_bytes]
            base = (y0 + py * dy) * w
            for px in range(pw):
                byte = row[(px * depth) // 8]
                shift = 8 - depth - (px * depth) % 8
                out[base + x0 + px * dx] = (byte >> shift) & mask
    return bytes(out)


def _png_raw_size(
    w: int, h: int, depth: int, channels: int, sample_bytes: int,
    interlace: int,
) -> int:
    """Exact inflated-stream size (filter byte + packed row data per
    scanline, per Adam7 pass when interlaced) — the zip-bomb cap."""
    def rb(px: int) -> int:
        if depth < 8:
            return (px * depth + 7) // 8
        return px * channels * sample_bytes

    if interlace == 0:
        return h * (rb(w) + 1)
    total = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx if w > x0 else 0
        ph = (h - y0 + dy - 1) // dy if h > y0 else 0
        if pw and ph:
            total += ph * (rb(pw) + 1)
    return total


_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> samples/pixel


def _decode_png_pixels(payload: bytes):
    import zlib

    w, h = struct.unpack(">II", payload[16:24])
    depth, ctype, comp, filt, interlace = payload[24:29]
    low_depth = depth in (1, 2, 4) and ctype in (0, 3)
    if (
        (depth not in (8, 16) and not low_depth)
        or ctype not in _PNG_CHANNELS
        or (depth == 16 and ctype == 3)  # 16-bit palette indices illegal
        or comp or filt or interlace > 1
    ):
        return None  # subset: 8/16-bit and 1/2/4-bit gray/palette,
        # ordered or Adam7
    channels = _PNG_CHANNELS[ctype]
    sample_bytes = max(1, depth // 8)  # filters operate on BYTES
    if w * h * channels > 1 << 26:  # zip-bomb fence (see _lzw_decode note)
        return None
    idat = bytearray()
    plte = None
    pos = 8
    n = len(payload)
    while pos + 8 <= n:
        (size,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        if tag == b"IDAT":
            idat += payload[pos + 8 : pos + 8 + size]
        elif tag == b"PLTE":
            plte = payload[pos + 8 : pos + 8 + size]
        elif tag == b"IEND":
            break
        pos += 12 + size  # len + tag + body + crc
    try:
        # cap inflate output at the EXACT header-implied raw size
        # (summed per Adam7 pass when interlaced): a crafted IDAT can
        # otherwise expand ~1000x and OOM the task before any size
        # check runs
        cap = _png_raw_size(
            int(w), int(h), depth, channels, sample_bytes, interlace
        )
        d = zlib.decompressobj()
        raw = d.decompress(bytes(idat), cap + 1)
        if len(raw) > cap or not d.eof:  # over-cap bomb / truncated stream
            return None
    except zlib.error:
        return None
    if interlace == 1 and low_depth:
        pixels = _png_deinterlace_packed(raw, int(w), int(h), depth)
    elif interlace == 1:
        pixels = _png_deinterlace(raw, int(w), int(h), channels * sample_bytes)
    elif low_depth:  # filters act on the PACKED bytes (bpp = 1)
        res = _png_unfilter(raw, (w * depth + 7) // 8, int(h), 1)
        pixels = res[0] if res else None
        if pixels is not None:  # unpack MSB-first indices per scanline
            row_bytes = (w * depth + 7) // 8
            mask = (1 << depth) - 1
            out = bytearray()
            for y in range(h):
                row = pixels[y * row_bytes : (y + 1) * row_bytes]
                for x in range(w):
                    byte = row[(x * depth) // 8]
                    shift = 8 - depth - (x * depth) % 8
                    out.append((byte >> shift) & mask)
            pixels = bytes(out)
    else:
        res = _png_unfilter(raw, int(w), int(h), channels * sample_bytes)
        pixels = res[0] if res else None
    if pixels is None:
        return None
    if depth == 16:  # 8-bit presentation: keep the high (big-endian) byte
        pixels = pixels[0::2]
    if ctype == 0 and depth < 8:  # low-depth gray: scale to 8-bit
        mx = (1 << depth) - 1
        pixels = bytes((v * 255) // mx for v in pixels)
    if ctype == 3:  # paletted: indices -> PLTE RGB triples (spec §11.2.3)
        if plte is None or len(plte) % 3:
            return None
        n_colors = len(plte) // 3
        if any(i >= n_colors for i in pixels):
            return None
        pixels = b"".join(plte[3 * i : 3 * i + 3] for i in pixels)
        return "png", int(w), int(h), 3, pixels
    return "png", int(w), int(h), channels, pixels


def _bmp_rle8(data: bytes, w: int, h: int) -> bytes | None:
    """BI_RLE8 (Windows BMP spec): encoded-run (count, index) pairs,
    absolute mode (0, n, n indices, pad to word), end-of-line (0,0),
    end-of-bitmap (0,1), delta (0,2,dx,dy — emits index 0 filler).
    Returns h*w bottom-up index rows or None."""
    rows = [bytearray(w) for _ in range(h)]
    x = y = pos = 0
    n = len(data)
    while pos + 2 <= n and y < h:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt:  # encoded run
            rows[y][x : x + cnt] = bytes([val]) * min(cnt, w - x)
            x = min(x + cnt, w)
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            break
        elif val == 2:  # delta
            if pos + 2 > n:
                return None
            x = min(x + data[pos], w)
            y += data[pos + 1]
            pos += 2
        else:  # absolute mode: val literal indices, word-aligned
            if pos + val > n:
                return None
            take = min(val, w - x)
            rows[y][x : x + take] = data[pos : pos + take]
            x += take
            pos += val + (val & 1)
    return b"".join(rows)


def _decode_bmp8_pixels(payload: bytes, w: int, h_raw: int, compression: int):
    """8bpp paletted BMP: BGRA-quad color table after the info header,
    uncompressed rows (4-byte padded) or BI_RLE8; normalized to
    top-down RGB like the 24/32bpp path."""
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    (data_off,) = struct.unpack("<I", payload[10:14])
    (n_colors,) = struct.unpack("<I", payload[46:50])
    n_colors = n_colors or 256
    pal_at = 14 + hdr_size
    palette = payload[pal_at : pal_at + 4 * n_colors]
    if len(palette) < 4 * n_colors:
        return None
    top_down = h_raw < 0
    h = abs(h_raw)
    if compression == 1:  # BI_RLE8 (spec forbids it for top-down)
        if top_down:
            return None
        idx_rows = _bmp_rle8(payload[data_off:], w, h)
        if idx_rows is None:
            return None
    else:  # uncompressed 8bpp, 4-byte padded rows
        row_bytes = (w + 3) // 4 * 4
        if len(payload) < data_off + row_bytes * h:
            return None
        idx_rows = b"".join(
            payload[data_off + r * row_bytes : data_off + r * row_bytes + w]
            for r in range(h)
        )
    import numpy as np

    pal = np.frombuffer(palette, np.uint8).reshape(-1, 4)[:, [2, 1, 0]]  # BGRx->RGB
    idx = np.frombuffer(idx_rows, np.uint8).reshape(h, w)
    if not top_down:
        idx = idx[::-1]
    return "bmp", int(w), int(h), 3, pal[idx].tobytes()


_SVG_DIM = rb'\s(?:%s)\s*=\s*["\']\s*([0-9]+(?:\.[0-9]+)?)\s*(?:px)?\s*["\']'


def parse_svg_header(payload: bytes) -> tuple[str, int, int] | None:
    """SVG metadata: width/height attributes (px or unitless) from the
    root <svg> tag, falling back to the viewBox extent. Rendering is a
    rasterizer's job; dimension filtering is the curation need."""
    head = payload[:4096].lstrip()
    if not (head.startswith(b"<svg") or (head.startswith(b"<?xml") and b"<svg" in head)):
        return None
    tag_at = head.find(b"<svg")
    tag_end = head.find(b">", tag_at)
    tag = head[tag_at : tag_end if tag_end > 0 else len(head)]
    dims = []
    for attr in (b"width", b"height"):
        m = re.search(_SVG_DIM % attr, tag)
        dims.append(round(float(m.group(1))) if m else None)
    if dims[0] and dims[1]:
        return "svg", dims[0], dims[1]
    vb = re.search(
        rb'\sviewBox\s*=\s*["\']\s*[-0-9.]+[\s,]+[-0-9.]+[\s,]+'
        rb'([0-9.]+)[\s,]+([0-9.]+)',
        tag,
    )
    if vb:
        try:
            return "svg", round(float(vb.group(1))), round(float(vb.group(2)))
        except ValueError:
            return None
    return None


def _ico_frames(payload: bytes):
    """Validated ICO directory: yields (w, h, bpp, offset, size)."""
    if len(payload) < 6 or payload[:4] != b"\x00\x00\x01\x00":
        return None
    (count,) = struct.unpack("<H", payload[4:6])
    if not 1 <= count <= 64 or len(payload) < 6 + 16 * count:
        return None
    frames = []
    for i in range(count):
        e = payload[6 + 16 * i : 6 + 16 * (i + 1)]
        w, h = e[0] or 256, e[1] or 256
        (bpp,) = struct.unpack("<H", e[6:8])
        size, off = struct.unpack("<II", e[8:16])
        if off + size > len(payload) or size < 16:
            return None
        frames.append((w, h, bpp, off, size))
    return frames


def parse_ico_header(payload: bytes) -> tuple[str, int, int] | None:
    """ICO metadata: the LARGEST frame's dimensions (the convention
    image tooling reports for multi-resolution icons)."""
    frames = _ico_frames(payload)
    if not frames:
        return None
    w, h, _, _, _ = max(frames, key=lambda f: f[0] * f[1])
    return "ico", int(w), int(h)


def _decode_ico_pixels(payload: bytes):
    """ICO pixel decode for the largest frame: embedded-PNG frames
    reuse the PNG decoder; classic DIB frames (BITMAPINFOHEADER with
    DOUBLED height for the AND mask) decode 32bpp BGRA and 8bpp
    paletted XOR images, bottom-up normalized. The AND mask is ignored
    for 32bpp (alpha channel supersedes it) and applied as binary
    alpha for 8bpp."""
    import numpy as np

    frames = _ico_frames(payload)
    if not frames:
        return None
    w, h, _, off, size = max(frames, key=lambda f: f[0] * f[1])
    frame = payload[off : off + size]
    if frame[:8] == b"\x89PNG\r\n\x1a\n":
        out = _decode_png_pixels(frame)
        if out is None:
            return None
        return ("ico",) + out[1:]
    if len(frame) < 40 or struct.unpack("<I", frame[:4])[0] != 40:
        return None
    bw, bh2 = struct.unpack("<ii", frame[4:12])
    planes, bpp = struct.unpack("<HH", frame[12:16])
    (compression,) = struct.unpack("<I", frame[16:20])
    if compression or bw != w or bh2 != 2 * h or bpp not in (8, 32):
        return None
    if bpp == 32:
        row = w * 4
        body = frame[40 : 40 + row * h]
        if len(body) < row * h:
            return None
        arr = np.frombuffer(body, np.uint8).reshape(h, w, 4)[::-1]
        rgba = arr[..., [2, 1, 0, 3]]  # BGRA -> RGBA
        return "ico", int(w), int(h), 4, rgba.tobytes()
    (n_colors,) = struct.unpack("<I", frame[32:36])
    n_colors = n_colors or 256
    pal = np.frombuffer(
        frame[40 : 40 + 4 * n_colors], np.uint8
    ).reshape(-1, 4)[:, [2, 1, 0]]
    xor_at = 40 + 4 * n_colors
    row = (w + 3) // 4 * 4
    body = frame[xor_at : xor_at + row * h]
    if len(pal) < n_colors or len(body) < row * h:
        return None
    idx = (
        np.frombuffer(body, np.uint8).reshape(h, row)[:, :w][::-1]
    )
    if idx.max() >= n_colors:
        return None
    return "ico", int(w), int(h), 3, pal[idx].tobytes()


def _decode_bmp_pixels(payload: bytes):
    (data_off,) = struct.unpack("<I", payload[10:14])
    hdr_size = struct.unpack("<I", payload[14:18])[0]
    if hdr_size < 40:
        return None
    w, h_raw = struct.unpack("<ii", payload[18:26])
    planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if w <= 0:
        return None
    if bpp == 8 and compression in (0, 1):
        return _decode_bmp8_pixels(payload, w, h_raw, compression)
    channel_order = None  # byte index of (R, G, B[, A]) within a pixel
    if compression == 3 and bpp == 32 and hdr_size >= 56:
        # BI_BITFIELDS with masks in the V4/V5 header (offsets 40-55):
        # accept byte-aligned masks (the case real writers emit) by
        # mapping each channel to its byte lane
        masks = struct.unpack("<4I", payload[54:70])  # R, G, B, A
        lanes = []
        for m in masks[:3]:
            if m not in (0xFF, 0xFF00, 0xFF0000, 0xFF000000):
                return None
            lanes.append({0xFF: 0, 0xFF00: 1, 0xFF0000: 2, 0xFF000000: 3}[m])
        a_lane = (
            {0xFF: 0, 0xFF00: 1, 0xFF0000: 2, 0xFF000000: 3}.get(masks[3])
        )
        if a_lane is None and masks[3] != 0:
            return None
        channel_order = lanes + ([a_lane] if a_lane is not None else [])
    elif compression != 0 or bpp not in (24, 32):
        return None
    top_down = h_raw < 0
    h = abs(h_raw)
    nch = bpp // 8
    row_bytes = (w * nch + 3) // 4 * 4
    if len(payload) < data_off + row_bytes * h:
        return None
    import numpy as np

    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_bytes * h, offset=data_off
    ).reshape(h, row_bytes)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    if channel_order is not None:
        nch = len(channel_order)
        out = rows[..., channel_order]
    else:
        out = rows.copy()
        out[..., 0], out[..., 2] = rows[..., 2], rows[..., 0]  # BGR(A)->RGB(A)
    return "bmp", int(w), int(h), nch, out.tobytes()


def _decode_pnm_pixels(payload: bytes):
    m = _PNM_HEADER.match(payload)
    if not m:
        return None
    magic = m.group(1).decode("ascii")
    w, h = int(m.group(2)), int(m.group(3))
    if magic in ("P2", "P3", "P5", "P6"):
        # one more header token: maxval
        mv = re.match(
            rb"\s*(?:#[^\n]*\s+)*(\d+)\s", payload[m.end() - 1 :]
        )
        if not mv or int(mv.group(1)) > 65535:
            return None
        maxval = int(mv.group(1))
        wide = maxval > 255  # two-byte big-endian samples (Netpbm spec)
        body_at = m.end() - 1 + mv.end()
        channels = 3 if magic in ("P3", "P6") else 1
        n_vals = w * h * channels
        if magic in ("P5", "P6"):
            need = n_vals * (2 if wide else 1)
            body = payload[body_at : body_at + need]
            if len(body) < need:
                return None
            if wide:  # 8-bit presentation: high byte, like 16-bit PNG
                body = body[0::2]
            return magic.lower(), w, h, channels, bytes(body)
        vals = payload[body_at:].split()
        if len(vals) < n_vals:
            return None
        shift = 8 if wide else 0
        return (
            magic.lower(), w, h, channels,
            bytes(min(int(v) >> shift, 255) for v in vals[:n_vals]),
        )
    return None  # P1/P4 bitmaps: out of the supported subset


def decode_image_pixels(
    payload: bytes,
) -> tuple[str, int, int, int, bytes] | None:
    """REAL pixel decode, zero dependencies, for the stdlib-decodable
    subset (see section comment). Returns ``(fmt, width, height,
    channels, pixels)`` with pixels row-major TOP-DOWN, channel-
    interleaved RGB(A)/gray order — BMP's bottom-up BGR rows, PNG's
    filtered scanlines, GIF's LZW+palette+interlace, paletted PNG and
    JPEG both baseline and progressive (Huffman + IDCT + YCbCr,
    jpegcodec.py), and lossless WebP (VP8L transforms + LZ77 + color
    cache, webplcodec.py) are all normalized — or None for formats
    outside the subset (lossy WebP/VP8 and lossy audio/video) or
    malformed bytes."""
    try:
        if len(payload) >= 33 and payload[:8] == b"\x89PNG\r\n\x1a\n" and payload[12:16] == b"IHDR":
            return _decode_png_pixels(payload)
        if len(payload) >= 54 and payload[:2] == b"BM":
            return _decode_bmp_pixels(payload)
        if payload[:2] in (b"P2", b"P3", b"P5", b"P6"):
            return _decode_pnm_pixels(payload)
        if len(payload) >= 14 and payload[:6] in (b"GIF87a", b"GIF89a"):
            return _decode_gif_pixels(payload)
        if len(payload) >= 4 and payload[:2] == b"\xff\xd8":
            from .jpegcodec import decode_jpeg_pixels

            return decode_jpeg_pixels(payload)
        if len(payload) >= 8 and payload[:4] in (b"II*\x00", b"MM\x00*"):
            return _decode_tiff_pixels(payload)
        if payload[:4] == b"\x00\x00\x01\x00":
            return _decode_ico_pixels(payload)
        if len(payload) >= 20 and payload[:4] == b"RIFF" and payload[8:12] == b"WEBP":
            from .webplcodec import decode_webp_pixels

            return decode_webp_pixels(payload)
    except Exception:
        return None
    return None


def decode_wav_samples(
    payload: bytes,
) -> tuple[int, int, int, list[int]] | None:
    """REAL PCM sample decode, zero dependencies: returns
    ``(channels, sample_rate, bits, samples)`` with samples channel-
    interleaved in frame order — 8-bit unsigned, or 16/24/32-bit
    signed little-endian per the WAV spec — or None for
    non-PCM/compressed audio."""
    hdr = _parse_or_none(parse_wav_header, payload)
    if hdr is None:
        return None
    _fmt, channels, rate, bits, _n = hdr
    if bits not in (8, 16, 24, 32):
        return None
    # locate the data chunk body (same walk as parse_wav_header)
    pos, n = 12, len(payload)
    while pos + 8 <= n:
        tag = payload[pos : pos + 4]
        (size,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        if tag == b"data":
            body = payload[pos + 8 : pos + 8 + size]
            if bits == 16:
                usable = len(body) - len(body) % 2
                samples = list(
                    struct.unpack(f"<{usable // 2}h", body[:usable])
                )
            elif bits == 24:  # 3-byte little-endian signed
                usable = len(body) - len(body) % 3
                samples = [
                    int.from_bytes(body[i : i + 3], "little", signed=True)
                    for i in range(0, usable, 3)
                ]
            elif bits == 32:
                usable = len(body) - len(body) % 4
                samples = list(
                    struct.unpack(f"<{usable // 4}i", body[:usable])
                )
            else:
                samples = list(body)
            return channels, rate, bits, samples
        pos += 8 + size + (size & 1)
    return None


def _pattern_px(x: int, y: int, c: int, seed: int) -> int:
    """The deterministic test-pixel pattern shared by the patterned
    writers AND the SQL oracle: arithmetic on (x, y, channel, seed) that
    makes pixel sums, corners and orientation all oracle-predictable."""
    return (x + 7 * y + 11 * c + seed) % 256


def _pattern_rgb_array(width: int, height: int, seed: int):
    """(h, w, 3) uint8 array of ``_pattern_px`` via numpy broadcasting —
    the vectorized form of the shared pattern formula (per-pixel Python
    loops were the writers' hot path in the bench)."""
    import numpy as np

    x = np.arange(width, dtype=np.int32)[None, :, None]
    y = np.arange(height, dtype=np.int32)[:, None, None]
    c = np.arange(3, dtype=np.int32)[None, None, :]
    return ((x + 7 * y + 11 * c + seed) % 256).astype(np.uint8)


def encode_test_image_patterned(
    fmt: str, width: int, height: int, seed: int
) -> bytes:
    """Patterned RGB writer for the pixel-decode round-trip: same
    containers as ``encode_test_image`` but with ``_pattern_px`` pixel
    data instead of zero filler. The PNG variant cycles the row filter
    type through 0-4 (y % 5) so the oracled query exercises EVERY
    unfilter path, not just the trivial one; writers apply the forward
    filter transforms independently of the decoder's reverse ones
    (vectorized — forward filtering reads only ORIGINAL neighbor
    values, so every filter incl. Paeth is an elementwise expression
    over shifted arrays, unlike the inherently sequential reverse)."""
    import zlib

    import numpy as np

    arr = _pattern_rgb_array(width, height, seed)
    if fmt == "png":
        ihdr = struct.pack(">II", width, height) + b"\x08\x02\x00\x00\x00"

        def chunk(tag: bytes, body: bytes) -> bytes:
            return (
                struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
            )

        bpp, stride = 3, width * 3
        lines = arr.reshape(height, stride).astype(np.int16)
        # shifted views: left neighbor (by one pixel), up, up-left
        left = np.zeros_like(lines)
        left[:, bpp:] = lines[:, :-bpp]
        up = np.zeros_like(lines)
        up[1:] = lines[:-1]
        upleft = np.zeros_like(lines)
        upleft[1:, bpp:] = lines[:-1, :-bpp]
        p = left + up - upleft
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - upleft)
        paeth = np.where(
            (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
        )
        filtered_by_type = (
            lines,
            lines - left,
            lines - up,
            lines - ((left + up) >> 1),
            lines - paeth,
        )
        raw = bytearray()
        for y in range(height):
            ftype = y % 5
            raw.append(ftype)
            raw += (filtered_by_type[ftype][y] & 0xFF).astype(np.uint8).tobytes()
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b"")
        )
    if fmt == "bmp":
        # bottom-up BGR rows with 4-byte padding — exercises the
        # orientation + channel-order normalization
        row_bytes = (width * 3 + 3) // 4 * 4
        rows = np.zeros((height, row_bytes), dtype=np.uint8)
        rows[:, : width * 3] = arr[::-1, :, ::-1].reshape(height, width * 3)
        pix = rows.tobytes()
        info = struct.pack(
            "<IiiHHIIiiII", 40, width, height, 1, 24, 0, len(pix), 2835, 2835, 0, 0
        )
        off = 14 + 40
        hdr = b"BM" + struct.pack("<IHHI", off + len(pix), 0, 0, off)
        return hdr + info + pix
    if fmt == "ppm":
        hdr = f"P6 {width} {height} 255\n".encode("ascii")
        return hdr + arr.tobytes()
    if fmt == "tiff":
        # little-endian, chunky RGB, one uncompressed strip; layout:
        # header | strip data | bits-per-sample triple | IFD
        data = arr.tobytes()
        if len(data) & 1:
            data += b"\x00"  # TIFF offsets must stay word-aligned
        data_off = 8
        bits_off = data_off + len(data)
        ifd_off = bits_off + 6
        e = "<"
        entries = [
            struct.pack(e + "HHI", 256, 3, 1) + struct.pack(e + "HH", width, 0),
            struct.pack(e + "HHI", 257, 4, 1) + struct.pack(e + "I", height),
            struct.pack(e + "HHII", 258, 3, 3, bits_off),
            struct.pack(e + "HHI", 259, 3, 1) + struct.pack(e + "HH", 1, 0),
            struct.pack(e + "HHI", 262, 3, 1) + struct.pack(e + "HH", 2, 0),
            struct.pack(e + "HHII", 273, 4, 1, data_off),
            struct.pack(e + "HHI", 277, 3, 1) + struct.pack(e + "HH", 3, 0),
            struct.pack(e + "HHII", 278, 4, 1, height),
            struct.pack(e + "HHII", 279, 4, 1, width * height * 3),
        ]
        ifd = (
            struct.pack(e + "H", len(entries))
            + b"".join(entries)
            + struct.pack(e + "I", 0)
        )
        return (
            b"II*\x00"
            + struct.pack(e + "I", ifd_off)
            + data
            + struct.pack(e + "HHH", 8, 8, 8)
            + ifd
        )
    if fmt == "webp":
        from .webplcodec import encode_webp

        # lossless VP8L with the transforms a real encoder would pick
        # for synthetic gradients: subtract-green + cache + run LZ77
        return encode_webp(
            arr.tobytes(), width, height, 3,
            subtract_green=True, use_lz77=True, cache_bits=4,
        )
    raise ValueError(f"unknown patterned-image format: {fmt}")


PIXEL_STATS_SCHEMA = (
    "doc_id long, fmt string, width int, height int, channels int, "
    "n_values long, pixel_sum long, first_px int, last_px int"
)


def decode_image_pixel_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched PIXEL decode stage: binary payload → integer pixel
    statistics (count / sum / first / last of the normalized top-down
    RGB byte stream). Integer outputs keep the cross-engine oracle
    hash exact; first_px/last_px pin orientation and channel order —
    a decoder that forgets BMP's bottom-up rows or BGR swap fails the
    hash even though the sum survives. NULL row on unsupported or
    malformed payloads (same quarantine contract as the header trio)."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            parsed = [decode_image_pixels(p) for p in payloads]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "fmt": [t[0] if t else None for t in parsed],
                    "width": pd.array(
                        [t[1] if t else None for t in parsed], dtype="Int32"
                    ),
                    "height": pd.array(
                        [t[2] if t else None for t in parsed], dtype="Int32"
                    ),
                    "channels": pd.array(
                        [t[3] if t else None for t in parsed], dtype="Int32"
                    ),
                    "n_values": pd.array(
                        [len(t[4]) if t else None for t in parsed], dtype="Int64"
                    ),
                    "pixel_sum": pd.array(
                        [sum(t[4]) if t else None for t in parsed], dtype="Int64"
                    ),
                    "first_px": pd.array(
                        [t[4][0] if t and t[4] else None for t in parsed],
                        dtype="Int32",
                    ),
                    "last_px": pd.array(
                        [t[4][-1] if t and t[4] else None for t in parsed],
                        dtype="Int32",
                    ),
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema=PIXEL_STATS_SCHEMA
    )


TAGS_SCHEMA = (
    "doc_id long, title string, artist string, album string, "
    "language string, year string"
)


def decode_audio_tags(media: DataFrame) -> DataFrame:
    """Arrow-batched ID3v2 tag stage — the audio twin of
    ``decode_image_exif``: title/artist/album/language/year text
    frames from the tag prefixing scraped MP3s. NULL row when no tag."""
    from .audio_headers import parse_id3_tags

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                _parse_or_none(
                    parse_id3_tags, bytes(p) if p is not None else b""
                )
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    **{
                        col: [t.get(col) if t else None for t in parsed]
                        for col in ("title", "artist", "album", "language", "year")
                    },
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema=TAGS_SCHEMA
    )


EXIF_SCHEMA = (
    "doc_id long, orientation int, make string, model string, "
    "taken_at string"
)


def decode_image_exif(media: DataFrame) -> DataFrame:
    """Arrow-batched EXIF stage: JPEG APP1 TIFF walk for the curation
    tags (orientation 1-8 — the rotate/flip normalization key — camera
    make/model, capture datetime). NULL row when the payload has no
    EXIF segment or isn't a JPEG; orientation-aware dedup pipelines
    filter on this BEFORE paying pixel decode + rotation."""
    from .jpegcodec import parse_jpeg_exif

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            parsed = [
                parse_jpeg_exif(bytes(p) if p is not None else b"")
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "orientation": pd.array(
                        [t.get("orientation") if t else None for t in parsed],
                        dtype="Int32",
                    ),
                    "make": [t.get("make") if t else None for t in parsed],
                    "model": [t.get("model") if t else None for t in parsed],
                    "taken_at": [
                        t.get("datetime") if t else None for t in parsed
                    ],
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema=EXIF_SCHEMA
    )


def synthesize_test_media_patterned(
    ids: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Patterned-pixel writer half of the pixel round-trip: rotates
    png/bmp/ppm/gif/tiff/webp on the id (the round-8 widening adds the
    two lossless codecs shipped since r6 — TIFF strips and VP8L — per
    VERDICT r7 #4) with dimensions and pattern seed by fixed arithmetic
    the oracle replays. The GIF palette is constructed so
    pal[(x+7y+seed)%256][c] == _pattern_px(x,y,c,seed) — one pattern
    formula covers all six containers, LZW/VP8L and all."""
    fmts = ("png", "bmp", "ppm", "gif", "tiff", "webp")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_int = [int(i) for i in pdf[id_col]]
            payloads = []
            for i in ids_int:
                fmt, w, h, seed = fmts[i % 6], 1 + i % 32, 1 + (i * 7) % 32, i % 251
                payloads.append(
                    encode_test_gif(w, h, seed)
                    if fmt == "gif"
                    else encode_test_image_patterned(fmt, w, h, seed)
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": ["image/" + fmts[i % 6] for i in ids_int],
                }
            )

    return ids.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _lzw_decode(data: bytes, min_code: int, expected: int) -> bytes | None:
    """GIF-variant LZW (GIF89a spec appendix F): LSB-first variable-width
    codes, clear/EOI codes, 12-bit cap. Returns ``expected`` index bytes
    or None on a malformed stream. Streaming bit buffer + list table —
    the per-code dict version was the pixel bench's hot spot."""
    clear = 1 << min_code
    eoi = clear + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]  # clear/eoi slots
    code_size = min_code + 1
    table = list(base)
    out = bytearray()
    prev: bytes | None = None
    bitbuf = nbits = 0
    pos, n = 0, len(data)
    while len(out) < expected:
        while nbits < code_size:
            if pos >= n:
                return None  # stream exhausted before expected pixels
            bitbuf |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = bitbuf & ((1 << code_size) - 1)
        bitbuf >>= code_size
        nbits -= code_size
        if code == clear:
            code_size = min_code + 1
            table = list(base)
            prev = None
            continue
        if code == eoi:
            break
        ln = len(table)
        if code < ln and code != eoi and code != clear:
            entry = table[code]
        elif code == ln and prev is not None:
            entry = prev + prev[:1]
        else:
            return None
        if prev is not None and ln < 4096:
            table.append(prev + entry[:1])
            if ln + 1 == (1 << code_size) and code_size < 12:
                code_size += 1
        out += entry
        prev = entry
        if len(out) >= expected:
            break  # zip-bomb fence: never expand past the header's claim
    return bytes(out[:expected]) if len(out) >= expected else None


_GIF_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _decode_gif_pixels(payload: bytes):
    """GIF87a/89a first-frame pixel decode: logical-screen + palette
    parse, extension-block skip, image descriptor, LZW index stream,
    palette mapping to RGB, interlace reorder. Pure stdlib — round 7
    removes GIF from the compressed-codec stub list."""
    w, h = struct.unpack("<HH", payload[6:10])
    if w * h > 1 << 26:  # zip-bomb fence, matching the PNG/JPEG caps
        return None
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 ** ((flags & 0x07) + 1) * 3
        gct = payload[pos : pos + n]
        pos += n
    while pos < len(payload):
        b = payload[pos]
        if b == 0x3B:  # trailer
            return None
        if b == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(payload) and payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if b != 0x2C:  # not an image descriptor: corrupt
            return None
        ix, iy, iw, ih = struct.unpack("<HHHH", payload[pos + 1 : pos + 9])
        iflags = payload[pos + 9]
        pos += 10
        pal = gct
        if iflags & 0x80:  # local color table wins
            n = 2 ** ((iflags & 0x07) + 1) * 3
            pal = payload[pos : pos + n]
            pos += n
        if pal is None or iw == 0 or ih == 0:
            return None
        min_code = payload[pos]
        pos += 1
        lzw = bytearray()
        while pos < len(payload) and payload[pos]:
            size = payload[pos]
            lzw += payload[pos + 1 : pos + 1 + size]
            pos += 1 + size
        idx = _lzw_decode(bytes(lzw), min_code, iw * ih)
        if idx is None:
            return None
        if iflags & 0x40:  # interlaced: reassemble the four passes
            rows = [b""] * ih
            src = 0
            for start, step in _GIF_INTERLACE_PASSES:
                for y in range(start, ih, step):
                    rows[y] = idx[src * iw : (src + 1) * iw]
                    src += 1
            idx = b"".join(rows)
        import numpy as np

        n_colors = len(pal) // 3
        idx_arr = np.frombuffer(idx, dtype=np.uint8)
        if idx_arr.size and int(idx_arr.max()) >= n_colors:
            return None
        pal_arr = np.frombuffer(pal[: n_colors * 3], dtype=np.uint8).reshape(
            n_colors, 3
        )
        rgb = pal_arr[idx_arr].tobytes()
        # first frame only; report the FRAME's dims (a sub-frame GIF is
        # an animation optimization — the curation-relevant pixels)
        return "gif", int(iw), int(ih), 3, rgb
    return None


def encode_test_gif(width: int, height: int, seed: int) -> bytes:
    """Patterned GIF writer (spec-forward, independent of the decoder):
    256-entry palette with pal[i] = the pattern channels for gray level
    i, image indices = (x + 7*y + seed) % 256, LZW-coded with the
    classic 'uncompressed GIF' technique — a clear code before every
    run of literal codes so the 9-bit code width never grows. Exercises
    the decoder's clear-code reset path by construction."""
    lsd = struct.pack("<HH", width, height) + bytes((0xF7, 0, 0))  # 256-color GCT
    pal = bytearray()
    for i in range(256):
        pal += bytes((i, (i + 11) % 256, (i + 22) % 256))
    idesc = b"\x2c" + struct.pack("<HHHH", 0, 0, width, height) + b"\x00"
    indices = [
        (x + 7 * y + seed) % 256 for y in range(height) for x in range(width)
    ]
    # 9-bit codes, LSB-first: clear(256) then <=254 literals, ..., eoi(257)
    bits = bitpos = 0
    out = bytearray()

    def emit(code: int):
        nonlocal bits, bitpos
        bits |= code << bitpos
        bitpos += 9
        while bitpos >= 8:
            out.append(bits & 0xFF)
            bits >>= 8
            bitpos -= 8

    emit(256)
    for j, i in enumerate(indices):
        if j and j % 254 == 0:
            emit(256)  # keep the table empty enough to stay at 9 bits
        emit(i)
    emit(257)
    if bitpos:
        out.append(bits & 0xFF)
    blocks = bytearray()
    for i in range(0, len(out), 255):
        chunk = out[i : i + 255]
        blocks += bytes((len(chunk),)) + chunk
    return (
        b"GIF89a" + lsd + bytes(pal) + idesc + b"\x08" + bytes(blocks)
        + b"\x00" + b"\x3b"
    )


# ---------------------------------------------------------------------------
# Feature extraction & resize — the remaining verbs of the multimodal
# mandate (decode / feature-extract / resize / frame-sample), now running
# on REAL decoded pixels/samples instead of payload hashes.
# ---------------------------------------------------------------------------


def resize_nearest(
    pixels: bytes, w: int, h: int, ch: int, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of a row-major interleaved pixel
    buffer. src index = floor(dst * src_dim / dst_dim) — the standard
    half-open mapping, exactly reproducible in SQL (integer division),
    which is what makes a resize stage oracle-able."""
    if new_w <= 0 or new_h <= 0:
        raise ValueError("resize target must be positive")
    out = bytearray()
    for y in range(new_h):
        sy = y * h // new_h
        row = sy * w * ch
        for x in range(new_w):
            sx = x * w // new_w
            out += pixels[row + sx * ch : row + (sx + 1) * ch]
    return bytes(out)


def image_features(
    pixels: bytes, w: int, h: int, ch: int
) -> tuple[float, float, int, int]:
    """Curation-grade pixel statistics: mean brightness, contrast
    (population std of the byte stream), min, max. Cheap signals a
    filter pass runs BEFORE any model sees the image (all-black /
    all-white / low-contrast screening)."""
    n = len(pixels)
    if n == 0:
        return 0.0, 0.0, 0, 0
    s = sum(pixels)
    mean = s / n
    var = sum((b - mean) ** 2 for b in pixels) / n
    return mean, var**0.5, min(pixels), max(pixels)


def audio_features(
    samples: list[int], channels: int, rate: int, bits: int
) -> tuple[float, float, int]:
    """PCM statistics: duration seconds, RMS amplitude (normalized to
    full scale), peak absolute sample — the clipping / silence
    screening signals."""
    if not samples or channels <= 0 or rate <= 0:
        return 0.0, 0.0, 0
    n_frames = len(samples) // channels
    full = float((1 << (bits - 1)) if bits == 16 else 128)
    if bits == 8:  # unsigned: center first
        centered = [s - 128 for s in samples]
    else:
        centered = samples
    rms = (sum(s * s for s in centered) / len(centered)) ** 0.5 / full
    return n_frames / rate, rms, max(abs(s) for s in centered)


IMAGE_FEATURES_SCHEMA = (
    "doc_id long, fmt string, width int, height int, channels int, "
    "brightness double, contrast double, px_min int, px_max int"
)


def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode→feature stage: real pixel decode feeding
    ``image_features``; NULL row for undecodable payloads. numpy
    vectorizes the per-image math (the Python loop is per image, not
    per pixel)."""
    import numpy as np

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                t = decode_image_pixels(
                    bytes(payload) if payload is not None else b""
                )
                if t is None:
                    rows.append((doc_id, None, None, None, None, None, None, None, None))
                    continue
                fmt, w, h, ch, px = t
                arr = np.frombuffer(px, dtype=np.uint8)
                rows.append(
                    (
                        doc_id, fmt, w, h, ch,
                        float(arr.mean()) if arr.size else 0.0,
                        float(arr.std()) if arr.size else 0.0,
                        int(arr.min()) if arr.size else 0,
                        int(arr.max()) if arr.size else 0,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "width", "height", "channels",
                    "brightness", "contrast", "px_min", "px_max",
                ],
            ).astype(
                {
                    "width": "Int32", "height": "Int32", "channels": "Int32",
                    "px_min": "Int32", "px_max": "Int32",
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=IMAGE_FEATURES_SCHEMA
    )


RESIZED_SCHEMA = (
    "doc_id long, fmt string, width int, height int, "
    "n_values long, pixel_sum long, first_px int, last_px int"
)


def resize_image_stats(media: DataFrame, new_w: int, new_h: int) -> DataFrame:
    """decode → nearest-neighbor resize → integer stats, one Arrow
    stage. The thumbnail pass of a vision-data pipeline: every image
    lands at (new_w, new_h) regardless of source dims; stats instead of
    raw bytes keep the stage oracle-able and the shuffle tiny."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                t = decode_image_pixels(
                    bytes(payload) if payload is not None else b""
                )
                if t is None:
                    rows.append((doc_id, None, None, None, None, None, None, None))
                    continue
                fmt, w, h, ch, px = t
                rz = resize_nearest(px, w, h, ch, new_w, new_h)
                rows.append(
                    (
                        doc_id, fmt, new_w, new_h,
                        len(rz), sum(rz), rz[0], rz[-1],
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "fmt", "width", "height",
                    "n_values", "pixel_sum", "first_px", "last_px",
                ],
            ).astype(
                {
                    "width": "Int32", "height": "Int32",
                    "n_values": "Int64", "pixel_sum": "Int64",
                    "first_px": "Int32", "last_px": "Int32",
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        run, schema=RESIZED_SCHEMA
    )


PCM_STATS_SCHEMA = (
    "doc_id long, channels int, sample_rate int, bits int, "
    "n_samples long, sample_sum long, sample_min int, sample_max int, "
    "duration_ms long"
)


def decode_audio_samples(
    payload: bytes,
) -> tuple[int, int, int, list[int]] | None:
    """Container dispatch for SAMPLE decode: WAV PCM here; FLAC
    (lossless rice/LPC decode, ``operators/flaccodec.py``), AIFF and
    Sun .au PCM (``operators/audio_headers.py``) by magic.
    Returns ``(channels, sample_rate, bits, samples)`` interleaved, or
    None for lossy codecs (MP3/...) and malformed payloads."""
    if payload[:4] == b"fLaC":
        from .flaccodec import decode_flac_samples

        return decode_flac_samples(payload)
    if payload[:4] == b"FORM":
        from .audio_headers import decode_aiff_samples

        return _parse_or_none(decode_aiff_samples, payload)
    if payload[:4] == b".snd":
        from .audio_headers import decode_au_samples

        return _parse_or_none(decode_au_samples, payload)
    return decode_wav_samples(payload)


def decode_audio_pcm_stats(media: DataFrame) -> DataFrame:
    """Arrow-batched SAMPLE decode stage — the audio twin of
    ``decode_image_pixel_stats``: integer statistics over the decoded
    sample stream (sum / min / max pin the actual waveform bytes, not
    just the header), duration in integer milliseconds. Decodes WAV
    PCM and FLAC (lossless — identical stats for identical audio);
    NULL row for lossy/malformed payloads."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                t = decode_audio_samples(
                    bytes(payload) if payload is not None else b""
                )
                if t is None:
                    rows.append((doc_id,) + (None,) * 8)
                    continue
                ch, rate, bits, samples = t
                n_frames = len(samples) // ch if ch else 0
                rows.append(
                    (
                        doc_id, ch, rate, bits, len(samples),
                        sum(samples),
                        min(samples) if samples else None,
                        max(samples) if samples else None,
                        (n_frames * 1000) // rate if rate else None,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "channels", "sample_rate", "bits",
                    "n_samples", "sample_sum", "sample_min", "sample_max",
                    "duration_ms",
                ],
            ).astype(
                {
                    "channels": "Int32", "sample_rate": "Int32",
                    "bits": "Int32", "n_samples": "Int64",
                    "sample_sum": "Int64", "sample_min": "Int32",
                    "sample_max": "Int32", "duration_ms": "Int64",
                }
            )

    return media.select("doc_id", "payload").mapInPandas(
        decode, schema=PCM_STATS_SCHEMA
    )


def encode_test_wav_patterned(
    channels: int, sample_rate: int, bits: int, n_frames: int, seed: int
) -> bytes:
    """Patterned PCM writer: sample for frame f, channel c is
    ``((f * 13 + c * 5 + seed) % 97) - 48`` (16-bit signed) or the same
    shifted to 80..176 (8-bit unsigned) — closed-form arithmetic an
    oracle replays without touching bytes."""
    vals = [
        ((f * 13 + c * 5 + seed) % 97) - 48
        for f in range(n_frames)
        for c in range(channels)
    ]
    if bits == 16:
        data = struct.pack(f"<{len(vals)}h", *vals)
    elif bits == 8:
        data = bytes(v + 128 for v in vals)
    else:
        raise ValueError("patterned writer supports 8/16-bit PCM")
    block = channels * (bits // 8)
    fmt = struct.pack(
        "<HHIIHH", 1, channels, sample_rate, sample_rate * block, block, bits
    )
    chunks = (
        b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks
