"""Multimodal column plumbing — image/audio/video as opaque binary.

Design for a 100 TB media corpus: payloads live in a ``binary`` column
(or content-addressed object-store paths) beside typed metadata columns;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` stages so bytes cross the JVM↔Python boundary once per
batch, never per row.

Codec status (round 6): the HEADER-METADATA decode is REAL — a
zero-dependency parser for the four container formats whose headers
need no codec library (PNG / GIF / BMP / PPM-PGM), wired as the
default through ``decode_image_metadata`` and pinned by golden-byte
tests. Pixel decode (PIL/cv2) and av codecs (ffmpeg/torchaudio) remain
honestly stubbed — those libraries are absent in this container:
- ``decode_image_stub``: raises NotImplementedError (the honest stub
  for PIXEL decode);
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
      whitespace/comment separators (Netpbm format spec).

    This is the metadata half a curation pipeline actually runs at
    scale (filter by dimensions / aspect ratio BEFORE paying pixel
    decode); pixel decode stays behind ``decode_image_stub``."""
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
    m = _PNM_HEADER.match(payload)
    if m:
        return m.group(1).decode("ascii").lower(), int(m.group(2)), int(m.group(3))
    return None


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
    """Real decoder entry point — image libs absent in this container."""
    raise NotImplementedError(
        "image decode requires PIL/cv2; wire the real codec here in production"
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
    """Arrow-batched WAV-header decode stage — the audio twin of
    ``decode_image_metadata``; unrecognized payloads keep the row with
    NULL fields."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            parsed = [_parse_or_none(parse_wav_header, p) for p in payloads]
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
    """Fabricate REAL image payloads (valid PNG/GIF/BMP/PPM containers,
    format and dimensions derived from the id by fixed arithmetic) —
    the writer half of the oracled decode round-trip: the engine
    encodes real bytes and parses them back with the independent
    header parser, while the SQL oracle predicts the parsed metadata
    from the same arithmetic without touching bytes. Dimensions stay
    <= 32 so the Arrow batches carry a few KB per row."""
    fmts = ("png", "gif", "bmp", "ppm")

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_int = [int(i) for i in pdf[id_col]]
            payloads = [
                encode_test_image(fmts[i % 4], 1 + i % 32, 1 + (i * 7) % 32)
                for i in ids_int
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": [
                        "image/" + fmts[i % 4] for i in ids_int
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


def decode_video_metadata(media: DataFrame) -> DataFrame:
    """Arrow-batched MP4-header decode stage — the video third of the
    metadata trio; unrecognized payloads keep the row with NULLs."""

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            parsed = [_parse_or_none(parse_mp4_header, p) for p in payloads]
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


def synthesize_test_audio(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Audio twin of ``synthesize_test_media``: real (minimal, silent)
    PCM WAV containers with parameters derived from the id by fixed
    arithmetic, for the oracled decode round-trip."""
    rates = (8000, 16000, 22050, 44100)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_int = [int(i) for i in pdf[id_col]]
            payloads = [
                encode_test_wav(
                    channels=1 + i % 2,
                    sample_rate=rates[i % 4],
                    bits=8 * (1 + (i // 2) % 2),
                    n_samples=1 + i % 50,
                )
                for i in ids_int
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": ["audio/wav"] * len(ids_int),
                }
            )

    return ids.select(id_col).mapInPandas(gen, schema=MEDIA_SCHEMA)


def synthesize_test_video(ids: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Video third of the synthesize family: minimal valid ISO BMFF
    skeletons with parameters by id arithmetic."""
    scales = (600, 1000, 48000, 90000)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids_int = [int(i) for i in pdf[id_col]]
            payloads = [
                encode_test_mp4(
                    timescale=scales[i % 4],
                    duration=1000 + i * 37,
                    width=320 + (i % 16) * 8,
                    height=240 + (i % 16) * 8,
                    n_tracks=1 + i % 3,
                )
                for i in ids_int
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "payload": payloads,
                    "media_type": ["video/mp4"] * len(ids_int),
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
