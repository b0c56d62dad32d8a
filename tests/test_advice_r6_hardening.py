"""Round-7 regressions for the r6 ADVICE findings: malformed-media
hardening (mp4 v1 mvhd bound, empty tkhd, negative BMP width, the
try/except task fence), compaction-recovery safety when the journaled
tmp dir vanished, and /Length-delimited PDF stream bodies."""

from __future__ import annotations

import os
import struct
import zlib

import pytest

from debgpt7_8_with_vectordb_spark.operators.multimodal import (
    _parse_or_none,
    parse_image_header,
    parse_mp4_header,
    parse_wav_header,
)
from debgpt7_8_with_vectordb_spark.sources.readers import pdf_extract_text


def _box(tag: bytes, body: bytes) -> bytes:
    return struct.pack(">I", 8 + len(body)) + tag + body


# ---------------------------------------------------------------------------
# mp4: malformed boxes must yield None, never an exception
# ---------------------------------------------------------------------------


def test_mp4_short_v1_mvhd_body_is_skipped_not_misread():
    """A version-1 mvhd whose body is 28-31 bytes (v1 needs 32) used to
    pass the >=28 guard and read duration past the box end — struct
    error at EOF or a silent misread mid-file. Now it is skipped."""
    for body_len in (20, 28, 30, 31):
        mvhd = (b"\x01" + b"\x00" * (body_len - 1))
        blob = _box(b"ftyp", b"isom\x00\x00\x02\x00") + _box(
            b"moov", _box(b"mvhd", mvhd)
        )
        assert parse_mp4_header(blob) is None  # no timescale recovered
    # exactly 32 bytes parses fine
    mvhd32 = (
        b"\x01\x00\x00\x00" + struct.pack(">QQ", 0, 0)
        + struct.pack(">I", 48000) + struct.pack(">Q", 7)
    )
    blob = _box(b"ftyp", b"isom\x00\x00\x02\x00") + _box(
        b"moov", _box(b"mvhd", mvhd32)
    )
    assert parse_mp4_header(blob) == ("mp4", 48000, 7, 0, 0, 0)


def test_mp4_empty_tkhd_body_at_eof_no_indexerror():
    """`ver = payload[b3]` on an EMPTY tkhd body used to IndexError when
    the box ended the file; now the short body is skipped and the trak
    still counts."""
    mvhd = (
        b"\x00\x00\x00\x00" + struct.pack(">II", 0, 0)
        + struct.pack(">II", 1000, 5000)
    )
    trak = _box(b"trak", _box(b"tkhd", b""))
    blob = _box(b"ftyp", b"isom\x00\x00\x02\x00") + _box(
        b"moov", _box(b"mvhd", mvhd) + trak
    )
    assert parse_mp4_header(blob) == ("mp4", 1000, 5000, 0, 0, 1)


def test_bmp_negative_width_returns_none():
    """Negative int32 height is legal (top-down rows, abs()-normalized);
    negative or zero width is corrupt and must NOT leak into the
    metadata table where dimension filters would mis-handle it."""
    def bmp(w: int, h: int) -> bytes:
        info = struct.pack("<Iii", 40, w, h) + b"\x00" * 28
        return b"BM" + struct.pack("<IHHI", 54, 0, 0, 54) + info

    assert parse_image_header(bmp(-3, 2)) is None
    assert parse_image_header(bmp(0, 2)) is None
    assert parse_image_header(bmp(3, -2)) == ("bmp", 3, 2)


def test_parse_or_none_fences_any_parser_exception():
    """The decode stages route every per-payload parse through
    _parse_or_none: one malformed file yields a NULL row instead of a
    struct.error that kills the whole Spark task."""

    def explode(payload: bytes):
        raise struct.error("boom")

    assert _parse_or_none(explode, b"x") is None
    for parser in (parse_image_header, parse_wav_header, parse_mp4_header):
        # deterministic byte-noise sweep: no exception escapes the fence
        import random

        rng = random.Random(6)
        for n in (0, 1, 7, 64, 300):
            blob = bytes(rng.randrange(256) for _ in range(n))
            _parse_or_none(parser, blob)  # must not raise
            # prefix-truncations of valid-ish magic starts
            _parse_or_none(parser, b"\x89PNG\r\n\x1a\n" + blob)
            _parse_or_none(parser, b"RIFF" + blob)
            _parse_or_none(parser, struct.pack(">I", 20) + b"ftyp" + blob)


def test_decode_video_metadata_survives_malformed_payload(spark):
    """End-to-end through the Spark seam: the short-v1-mvhd payload that
    used to raise now comes back as a NULL-metadata row alongside good
    rows in the same Arrow batch."""
    from debgpt7_8_with_vectordb_spark.operators.multimodal import (
        decode_video_metadata,
        encode_test_mp4,
    )

    bad = _box(b"ftyp", b"isom\x00\x00\x02\x00") + _box(
        b"moov", _box(b"mvhd", b"\x01" + b"\x00" * 29)
    )
    rows = [
        (1, bytearray(encode_test_mp4(90000, 270000, 1280, 720, 1)), "video/mp4"),
        (2, bytearray(bad), "video/mp4"),
    ]
    media = spark.createDataFrame(
        rows, "doc_id long, payload binary, media_type string"
    )
    got = {r["doc_id"]: r["fmt"] for r in decode_video_metadata(media).collect()}
    assert got == {1: "mp4", 2: None}


# ---------------------------------------------------------------------------
# PDF: /Length-delimited bodies
# ---------------------------------------------------------------------------


def _pdf(dict_bytes: bytes, body: bytes, tail: bytes = b"") -> bytes:
    return (
        b"%PDF-1.4\n1 0 obj\n<<" + dict_bytes + b">>\nstream\n"
        + body + b"\nendstream\nendobj\n" + tail + b"trailer\n<<>>\n%%EOF"
    )


def test_pdf_flate_body_containing_endstream_token():
    """A FlateDecode body whose COMPRESSED bytes contain the literal
    token 'endstream' (guaranteed here via a stored-block zlib stream)
    used to be truncated at that token by the non-greedy scan — inflate
    failed and the text silently vanished. The direct /Length now
    delimits the body exactly."""
    content = b"BT (endstream inside compressed bytes) Tj ET"
    body = zlib.compress(content, 0)  # level 0 = stored blocks, literal bytes
    assert b"endstream" in body
    p = _pdf(
        b"/Length " + str(len(body)).encode() + b" /Filter /FlateDecode", body
    )
    assert pdf_extract_text(p) == "endstream inside compressed bytes"


def test_pdf_indirect_length_falls_back_to_scan():
    """/Length given as an indirect reference (`7 0 R`) can't delimit;
    the token scan still extracts filterless bodies."""
    p = _pdf(b"/Length 7 0 R", b"BT (indirect ok) Tj ET")
    assert pdf_extract_text(p) == "indirect ok"


def test_pdf_wrong_direct_length_falls_back_to_scan():
    """A direct /Length that does NOT land on an endstream keyword is
    treated as unreliable; the scan fallback still finds the body."""
    p = _pdf(b"/Length 99999", b"BT (bad length) Tj ET")
    assert pdf_extract_text(p) == "bad length"


def test_pdf_two_streams_after_length_delimited_one():
    """The scan must resume AFTER the /Length-delimited body, not
    mid-stream: a second text stream after the tricky one is found."""
    content = b"BT (first endstream-bearing) Tj ET"
    body = zlib.compress(content, 0)
    assert b"endstream" in body
    tail = (
        b"2 0 obj\n<</Length 21>>\nstream\nBT (second one) Tj ET\nendstream\n"
        b"endobj\n"
    )
    p = _pdf(
        b"/Length " + str(len(body)).encode() + b" /Filter /FlateDecode",
        body,
        tail=tail,
    )
    assert pdf_extract_text(p) == "first endstream-bearing\nsecond one"


# ---------------------------------------------------------------------------
# compaction recovery: vanished tmp must not delete the only copies
# ---------------------------------------------------------------------------


def test_recover_compaction_aborts_when_tmp_vanished(
    spark, sf_dir, tmp_path, monkeypatch
):
    """Crash after the marker commit but before ANY shard move-in, then
    the journaled tmp dir disappears (tmp-style cleanup / relocation).
    Recovery must leave the old shards and the marker alone — deleting
    st['old'] would destroy the only copies of the data."""
    import shutil

    from debgpt7_8_with_vectordb_spark.sinks import (
        COMPACT_MARKER,
        compact_corpus,
        recover_compaction,
        write_corpus,
    )
    from debgpt7_8_with_vectordb_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    out = str(tmp_path / "corpus")
    write_corpus(docs, out, partition_by=("lang",), max_records_per_file=5)
    before = sorted(
        tuple(r) for r in spark.read.parquet(out).select("doc_id", "lang").collect()
    )

    real_replace = os.replace
    calls = {"n": 0}

    def crash_after_marker(a, b):
        calls["n"] += 1
        if calls["n"] >= 2:  # 1 = marker commit, 2 = first move-in
            raise OSError("simulated crash before any move-in")
        real_replace(a, b)

    monkeypatch.setattr(os, "replace", crash_after_marker)
    with pytest.raises(OSError, match="simulated crash"):
        compact_corpus(spark, out, target_bytes=1 << 30)
    monkeypatch.setattr(os, "replace", real_replace)

    markers = [
        os.path.join(r, COMPACT_MARKER)
        for r, _, fs in os.walk(out)
        if COMPACT_MARKER in fs
    ]
    assert len(markers) == 1
    import json

    with open(markers[0]) as fh:
        st = json.load(fh)
    shutil.rmtree(st["tmp"])  # simulate external tmp cleanup

    assert recover_compaction(out) == []  # aborted, nothing "recovered"
    assert os.path.exists(markers[0])  # journal left for a re-run
    after = sorted(
        tuple(r) for r in spark.read.parquet(out).select("doc_id", "lang").collect()
    )
    assert after == before  # zero data loss


# ---------------------------------------------------------------------------
# round 7 follow-up: full PDF filter-chain coverage (LZW / ASCII85 /
# ASCIIHex / RunLength / chains) — the honest-limits list shrinks to
# CMaps + predictors + image codecs
# ---------------------------------------------------------------------------


def _pdf_lzw_encode(data: bytes) -> bytes:
    """Forward PDF/TIFF LZW encoder written from §7.4.4 (earlyChange=1),
    independent of the decoder, for round-trip tests."""
    table = {bytes([i]): i for i in range(256)}
    next_code, code_size = 258, 9
    codes = [(256, 9)]
    w = b""
    for b in data:
        wk = w + bytes([b])
        if wk in table:
            w = wk
            continue
        codes.append((table[w], code_size))
        if next_code < 4096:
            table[wk] = next_code
            next_code += 1
            if next_code >= (1 << code_size) - 1 and code_size < 12:
                code_size += 1
        w = bytes([b])
    if w:
        codes.append((table[w], code_size))
    codes.append((257, code_size))
    bits = bitpos = 0
    out = bytearray()
    for code, size in codes:
        bits = (bits << size) | code
        bitpos += size
        while bitpos >= 8:
            out.append((bits >> (bitpos - 8)) & 0xFF)
            bitpos -= 8
    if bitpos:
        out.append((bits << (8 - bitpos)) & 0xFF)
    return bytes(out)


def test_pdf_lzw_known_vector_and_roundtrip():
    from debgpt7_8_with_vectordb_spark.sources.readers import _pdf_lzw_decode

    # hand-packed: clear, 'A', 258 ('AA'), 'A', EOD -> AAAA
    assert _pdf_lzw_decode(bytes((0x80, 0x10, 0x60, 0x44, 0x18, 0x08))) == b"AAAA"
    for blob in (
        b"BT (lzw text) Tj ET",
        b"AB" * 400,  # forces dictionary growth past 9 bits
        bytes(range(256)) * 5,
        b"",
    ):
        assert _pdf_lzw_decode(_pdf_lzw_encode(blob)) == blob


@pytest.mark.parametrize(
    "filt,encode",
    [
        (b"/LZWDecode", lambda s: _pdf_lzw_encode(s)),
        (
            b"/ASCII85Decode",
            lambda s: __import__("base64").a85encode(s) + b"~>",
        ),
        (b"/ASCIIHexDecode", lambda s: s.hex().encode() + b">"),
        (
            b"/RunLengthDecode",
            lambda s: b"".join(
                bytes((len(c) - 1,)) + c
                for c in (s[i : i + 128] for i in range(0, len(s), 128))
            )
            + bytes((128,)),
        ),
    ],
)
def test_pdf_single_filter_streams(filt, encode):
    content = b"BT (filter " + filt.strip(b"/") + b" ok) Tj ET"
    body = encode(content)
    p = _pdf(
        b"/Length " + str(len(body)).encode() + b" /Filter " + filt, body
    )
    assert pdf_extract_text(p) == f"filter {filt[1:].decode()} ok"


def test_pdf_chained_filters_in_order():
    """[/ASCII85Decode /FlateDecode]: undo A85 first, then inflate —
    array order is application order (§7.3.8)."""
    import base64

    content = b"BT (chained) Tj ET"
    body = base64.a85encode(zlib.compress(content)) + b"~>"
    p = _pdf(
        b"/Length " + str(len(body)).encode()
        + b" /Filter [/ASCII85Decode /FlateDecode]",
        body,
    )
    assert pdf_extract_text(p) == "chained"


def test_pdf_image_filter_skipped_and_predictors_undone():
    jpeg = (
        b"2 0 obj\n<</Length 4 /Filter /DCTDecode>>\nstream\n"
        b"\xff\xd8\xff\xe0\nendstream\nendobj\n"
    )
    p = _pdf(b"/Length 17", b"BT (real) Tj ET\r\n", tail=jpeg)
    assert pdf_extract_text(p) == "real"

    # PNG Up-predictor (12), correctly applied forward: row r stores
    # filter tag 2 + (row - prev_row); unpredict must reverse it
    content = b"BT (png-pred) Tj ET!!"  # len 21 = 3 rows of 7
    cols = 7
    rows = [content[i : i + cols] for i in range(0, len(content), cols)]
    prev = bytes(cols)
    predicted = bytearray()
    for row in rows:
        predicted.append(2)
        predicted += bytes((row[i] - prev[i]) & 0xFF for i in range(cols))
        prev = row
    body = zlib.compress(bytes(predicted))
    p2 = _pdf(
        b"/Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode /DecodeParms <</Predictor 12 /Columns 7>>",
        body,
    )
    assert pdf_extract_text(p2) == "png-pred"

    # TIFF horizontal differencing (predictor 2)
    content = b"BT (tiff) Tj ET."  # len 16 = 2 rows of 8
    cols = 8
    out = bytearray()
    for r in range(0, len(content), cols):
        row = content[r : r + cols]
        out += bytes(
            (row[i] - (row[i - 1] if i else 0)) & 0xFF for i in range(cols)
        )
    body = zlib.compress(bytes(out))
    p3 = _pdf(
        b"/Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode /DecodeParms <</Predictor 2 /Columns 8>>",
        body,
    )
    assert pdf_extract_text(p3) == "tiff"

    # a stream whose predictor'd data is NOT valid (garbage tag byte)
    # is skipped, not garbled
    body = zlib.compress(b"BT (pred) Tj ET")
    p4 = _pdf(
        b"/Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode /DecodeParms <</Predictor 12 /Columns 4>>",
        body,
    )
    assert pdf_extract_text(p4) == ""


# ---------------------------------------------------------------------------
# ToUnicode CMaps: subset-font glyph codes mapped to real characters
# ---------------------------------------------------------------------------


def _font_pdf(cmap: bytes, content: bytes, font_name: bytes = b"F1") -> bytes:
    """Minimal PDF with a page-resource font carrying a ToUnicode CMap
    (object graph resolved by scan, no xref needed)."""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<</Type /Page /Resources <</Font <</" + font_name
        + b" 5 0 R>>>>>>\nendobj\n"
        b"5 0 obj\n<</Type /Font /Subtype /Type0 /ToUnicode 7 0 R>>\nendobj\n"
        b"7 0 obj\n<</Length " + str(len(cmap)).encode() + b">>\nstream\n"
        + cmap + b"\nendstream\nendobj\n"
        b"2 0 obj\n<</Length " + str(len(content)).encode() + b">>\nstream\n"
        + content + b"\nendstream\nendobj\n"
        b"trailer\n<<>>\n%%EOF"
    )


CMAP_2BYTE = (
    b"/CIDInit /ProcSet findresource begin\n"
    b"begincmap\n"
    b"1 begincodespacerange\n<0000> <FFFF>\nendcodespacerange\n"
    b"2 beginbfchar\n<0003> <0048>\n<0004> <0069>\nendbfchar\n"
    b"1 beginbfrange\n<0010> <0012> <0061>\nendbfrange\n"
    b"1 beginbfrange\n<0020> <0021> [<0058> <00590021>]\nendbfrange\n"
    b"endcmap\nend\n"
)


def test_pdf_tounicode_bfchar_and_bfrange():
    """Glyph codes 0003/0004 -> 'H'/'i'; range 0010-0012 -> 'a','b','c';
    array range 0020/0021 -> 'X' and a two-char mapping 'Y!'."""
    content = b"BT /F1 12 Tf <0003 0004 0010 0011 0012 0020 0021> Tj ET"
    p = _font_pdf(CMAP_2BYTE, content)
    assert pdf_extract_text(p) == "HiabcXY!"


def test_pdf_tounicode_one_byte_codespace():
    cmap = (
        b"begincmap\n"
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<41> <0051>\nendbfchar\n"  # 'A' glyph -> 'Q'
        b"endcmap\n"
    )
    # literal string: byte 0x41 maps to Q, byte 0x42 unmapped -> latin-1 'B'
    p = _font_pdf(cmap, b"BT /F1 10 Tf (AB) Tj ET")
    assert pdf_extract_text(p) == "QB"


def test_pdf_font_switch_mid_stream():
    """Only the ACTIVE font's CMap applies; switching to an unmapped
    font restores the default string decode."""
    content = (
        b"BT /F1 12 Tf <0003> Tj /F9 12 Tf (plain) Tj ET"
    )
    p = _font_pdf(CMAP_2BYTE, content)
    assert pdf_extract_text(p) == "Hplain"


def test_pdf_without_tounicode_unchanged():
    """No /ToUnicode anywhere: the fast path (no object indexing) and
    the old string decode are untouched."""
    p = _pdf(b"/Length 32", b"BT /F1 9 Tf (unchanged text) Tj ET")
    assert pdf_extract_text(p) == "unchanged text"


def _objstm_pdf(cmap: bytes, content: bytes, n: bytes | None = None) -> bytes:
    """Modern (PDF 1.5+ xref-stream era) shape: the page dict and font
    dict live INSIDE a Flate-compressed /Type /ObjStm object stream —
    only the content stream and the ToUnicode CMap stream (streams
    cannot nest in an ObjStm, §7.5.7) are top-level objects."""
    import zlib as _z

    inner10 = b"<</Type /Page /Resources <</Font <</F1 11 0 R>>>>>>"
    inner11 = b"<</Type /Font /Subtype /Type0 /ToUnicode 7 0 R>>"
    off11 = len(inner10) + 1
    header = b"10 0 11 " + str(off11).encode()
    first = len(header) + 1
    body = _z.compress(header + b"\n" + inner10 + b"\n" + inner11)
    return (
        b"%PDF-1.5\n"
        b"3 0 obj\n<</Type /ObjStm /N " + (n or b"2") + b" /First "
        + str(first).encode() + b" /Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode>>\nstream\n"
        + body + b"\nendstream\nendobj\n"
        b"7 0 obj\n<</Length " + str(len(cmap)).encode() + b">>\nstream\n"
        + cmap + b"\nendstream\nendobj\n"
        b"2 0 obj\n<</Length " + str(len(content)).encode() + b">>\nstream\n"
        + content + b"\nendstream\nendobj\n"
        b"trailer\n<<>>\n%%EOF"
    )


def test_pdf_objstm_font_resolution():
    """PDF 1.5 object streams (VERDICT parity vs pypdf): font + page
    dicts packed in a compressed ObjStm still resolve to their
    ToUnicode CMap — previously the /ToUnicode marker only existed
    compressed, the early-out fired, and subset-font text fell back to
    latin-1 mojibake."""
    content = b"BT /F1 12 Tf <0003 0004> Tj ET"
    p = _objstm_pdf(CMAP_2BYTE, content)
    assert pdf_extract_text(p) == "Hi"


def test_pdf_objstm_hostile_n_degrades():
    """A hostile /N cannot allocate unbounded slices: the expansion is
    skipped, and extraction degrades to the latin-1 fallback instead of
    crashing (glyph codes 0003/0004 surface as raw control chars, which
    the extractor renders as-is)."""
    content = b"BT /F1 12 Tf (plain) Tj ET"
    p = _objstm_pdf(CMAP_2BYTE, content, n=b"999999999")
    assert pdf_extract_text(p) == "plain"


def test_pdf_objstm_corrupt_stream_degrades():
    """An ObjStm whose Flate body is corrupt is skipped; top-level
    streams still extract."""
    good = _objstm_pdf(CMAP_2BYTE, b"BT (ok) Tj ET")
    corrupt = good.replace(b"stream\n\x78", b"stream\n\x00", 1)
    assert pdf_extract_text(corrupt) == "ok"


def _diff_font_pdf(encoding: bytes, content: bytes, indirect: bool = False) -> bytes:
    """Simple font with a custom /Encoding /Differences and NO
    /ToUnicode — the scanned-object shape pypdf decodes via the Adobe
    Glyph List."""
    if indirect:
        font = b"<</Type /Font /Subtype /Type1 /Encoding 8 0 R>>"
        enc_obj = b"8 0 obj\n<</Type /Encoding /Differences " + encoding + b">>\nendobj\n"
    else:
        font = (
            b"<</Type /Font /Subtype /Type1 /Encoding "
            b"<</Type /Encoding /Differences " + encoding + b">>>>"
        )
        enc_obj = b""
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<</Type /Page /Resources <</Font <</F1 5 0 R>>>>>>\nendobj\n"
        b"5 0 obj\n" + font + b"\nendobj\n" + enc_obj +
        b"2 0 obj\n<</Length " + str(len(content)).encode() + b">>\nstream\n"
        + content + b"\nendstream\nendobj\n"
        b"trailer\n<<>>\n%%EOF"
    )


def test_pdf_differences_encoding_inline():
    """Codes 1..3 remapped via glyph names: table name (ampersand),
    single-char name (Z), uniXXXX form; unmapped bytes keep latin-1."""
    enc = b"[1 /ampersand /Z /uni20AC]"
    p = _diff_font_pdf(enc, b"BT /F1 9 Tf (\x01\x02\x03 ok) Tj ET")
    assert pdf_extract_text(p) == "&Z€ ok"


def test_pdf_differences_encoding_indirect_and_repositioning():
    """Indirect /Encoding object; integers reposition the code counter
    mid-array (PDF 1.7 §9.6.6.3); unknown subset names (g12) are
    skipped and keep the latin-1 fallback."""
    enc = b"[65 /bullet /g12 128 /emdash /quotedblleft]"
    # A(65)->bullet, B(66)->unknown g12 stays 'B', 0x80->emdash, 0x81->ldquo
    p = _diff_font_pdf(
        enc, b"BT /F1 9 Tf (AB\x80\x81) Tj ET", indirect=True
    )
    assert pdf_extract_text(p) == "•B—“"


def test_pdf_tounicode_wins_over_differences():
    """When a font has BOTH, ToUnicode takes precedence (it is the
    authoritative extraction table per the spec)."""
    cmap = (
        b"begincmap\n"
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<41> <0051>\nendbfchar\n"
        b"endcmap\n"
    )
    p = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<</Type /Page /Resources <</Font <</F1 5 0 R>>>>>>\nendobj\n"
        b"5 0 obj\n<</Type /Font /ToUnicode 7 0 R /Encoding "
        b"<</Differences [65 /bullet]>>>>\nendobj\n"
        b"7 0 obj\n<</Length " + str(len(cmap)).encode() + b">>\nstream\n"
        + cmap + b"\nendstream\nendobj\n"
        b"2 0 obj\n<</Length 24>>\nstream\nBT /F1 9 Tf (A) Tj ET\nendstream\nendobj\n"
        b"trailer\n<<>>\n%%EOF"
    )
    assert pdf_extract_text(p) == "Q"


def test_pdf_objstm_rewinding_offsets_cut_off():
    """Code-review r10 finding: ascending offsets are the byte bound —
    a hostile pair table that rewinds offsets (each slice ~ the whole
    decoded stream) is cut off at the first violation instead of
    multiplying allocations; extraction degrades gracefully."""
    import zlib as _z

    from debgpt7_8_with_vectordb_spark.sources.readers import (
        _pdf_object_index,
    )

    inner = b"<</Type /Page>>"
    # offsets: 0, big, 0, big, ... (rewinds after the second pair)
    header = b"10 0 11 16 12 0 13 16"
    first = len(header) + 1
    body = _z.compress(header + b"\n" + inner + b"\n" + inner)
    payload = (
        b"%PDF-1.5\n3 0 obj\n<</Type /ObjStm /N 4 /First "
        + str(first).encode() + b" /Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode>>\nstream\n" + body
        + b"\nendstream\nendobj\ntrailer\n<<>>\n%%EOF"
    )
    objs, spaces = _pdf_object_index(payload)
    # pair 1 registers; pair 2's slice is invalidated by the rewinding
    # NEXT offset (start > stop); pair 3 rewinds -> expansion cut off
    assert 10 in objs
    assert 12 not in objs and 13 not in objs
    assert len(spaces) == 1


def test_differences_parser_properties():
    """Property: for ANY interleaving of code-setters and glyph names,
    the table equals the straightforward reference walk — integers set
    the counter, every name consumes one code, unknown names leave
    gaps (PDF 1.7 §9.6.6.3)."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from debgpt7_8_with_vectordb_spark.sources.readers import (
        _glyph_to_char,
        _parse_differences,
    )

    tokens = st.lists(
        st.one_of(
            st.integers(min_value=0, max_value=255),
            st.sampled_from(
                ["A", "z", "ampersand", "bullet", "uni20AC", "g7",
                 "emdash", "nosuchglyph", "u1F600", "space"]
            ),
        ),
        max_size=24,
    )

    @settings(max_examples=300, deadline=None)
    @given(tokens)
    def check(toks):
        arr = b" ".join(
            str(t).encode() if isinstance(t, int) else b"/" + t.encode()
            for t in toks
        )
        got = _parse_differences(arr)
        want = {}
        code = 0
        for t in toks:
            if isinstance(t, int):
                code = t
            else:
                ch = _glyph_to_char(t.encode())
                if ch is not None:
                    want[code] = ch
                code += 1
        assert got == want

    check()
    # the algorithmic name forms
    assert _glyph_to_char(b"uni0041") == "A"
    assert _glyph_to_char(b"u1F600") == "😀"
    assert _glyph_to_char(b"Q") == "Q"
    assert _glyph_to_char(b"g42") is None  # subset glyph: no mapping
    assert _glyph_to_char(b"uniXYZW") is None
    assert _glyph_to_char(b"\xff\xfe") is None  # non-ascii name bytes


# ---------------------------------------------------------------------------
# /Predictor at every legal /BitsPerComponent (NOTES r10 honest-limit
# closure): sub-byte TIFF differencing is sample-exact, PNG filters run
# byte-wise over the bit-padded stride, 16-bit TIFF adds word-wise
# ---------------------------------------------------------------------------


def _pack_bits(vals: list[int], bpc: int, stride: int) -> bytes:
    acc = 0
    for v in vals:
        acc = (acc << bpc) | v
    pad = stride * 8 - len(vals) * bpc
    return (acc << pad).to_bytes(stride, "big")


def test_pdf_tiff_predictor_subbyte_components():
    import random

    from debgpt7_8_with_vectordb_spark.sources.readers import _pdf_unpredict

    rng = random.Random(7)
    for bpc, colors, cols in ((4, 1, 11), (2, 3, 5), (1, 1, 19)):
        mask = (1 << bpc) - 1
        nsamp = cols * colors
        stride = (nsamp * bpc + 7) // 8  # rows byte-aligned (bit-padded)
        rows = [
            [rng.randrange(mask + 1) for _ in range(nsamp)] for _ in range(3)
        ]
        raw = b"".join(_pack_bits(r, bpc, stride) for r in rows)
        pred = bytearray()
        for r in rows:
            d = list(r)
            for s in range(nsamp - 1, colors - 1, -1):
                d[s] = (d[s] - d[s - colors]) & mask
            pred += _pack_bits(d, bpc, stride)
        parms = (
            b"<</Predictor 2 /Columns " + str(cols).encode()
            + b" /Colors " + str(colors).encode()
            + b" /BitsPerComponent " + str(bpc).encode() + b">>"
        )
        assert _pdf_unpredict(parms, bytes(pred)) == raw, (bpc, colors)


def test_pdf_tiff_predictor_16bit_components():
    import random

    from debgpt7_8_with_vectordb_spark.sources.readers import _pdf_unpredict

    rng = random.Random(11)
    cols, colors = 6, 2
    rows = [[rng.randrange(65536) for _ in range(cols * colors)] for _ in range(2)]
    raw = b"".join(
        b"".join(v.to_bytes(2, "big") for v in r) for r in rows
    )
    pred = bytearray()
    for r in rows:
        d = list(r)
        for s in range(len(d) - 1, colors - 1, -1):
            d[s] = (d[s] - d[s - colors]) & 0xFFFF
        pred += b"".join(v.to_bytes(2, "big") for v in d)
    parms = b"<</Predictor 2 /Columns 6 /Colors 2 /BitsPerComponent 16>>"
    assert _pdf_unpredict(parms, bytes(pred)) == raw


def test_pdf_png_predictor_subbyte_components():
    from debgpt7_8_with_vectordb_spark.sources.readers import _pdf_unpredict

    # bpc=1: PNG filtering is byte-wise with bpp=1 over the padded
    # stride (PNG §9.2); forward-apply Sub then Up and reverse
    raw_rows = [b"\xa5\x3c\x07", b"\x12\xff\x80"]  # stride 3 = ceil(19/8)
    pred = bytearray()
    prev = bytes(3)
    for row, tag in zip(raw_rows, (1, 2)):
        pred.append(tag)
        if tag == 1:  # Sub
            line = bytes(
                (row[i] - (row[i - 1] if i else 0)) & 0xFF for i in range(3)
            )
        else:  # Up
            line = bytes((row[i] - prev[i]) & 0xFF for i in range(3))
        pred += line
        prev = row
    parms = b"<</Predictor 15 /Columns 19 /Colors 1 /BitsPerComponent 1>>"
    assert _pdf_unpredict(parms, bytes(pred)) == b"".join(raw_rows)
    # 12-bit pixels (colors=3, bpc=4) on an odd stride are the one
    # honest remainder: not expressible, skipped rather than garbled
    parms = b"<</Predictor 15 /Columns 3 /Colors 3 /BitsPerComponent 4>>"
    assert _pdf_unpredict(parms, b"\x00\x00\x00\x00\x00\x00") is None


def test_pdf_subbyte_predictor_end_to_end():
    import zlib

    from debgpt7_8_with_vectordb_spark.sources.readers import pdf_extract_text

    # a content stream run through forward TIFF differencing at bpc=4
    # (each byte = two 4-bit samples) must extract after the reverse
    content = b"BT (sub-byte) Tj ET"  # 19 bytes -> pad to stride
    cols = 38  # 38 4-bit samples per row = 19 bytes, one row
    samples = []
    for b in content:
        samples += [b >> 4, b & 0xF]
    diff = list(samples)
    for s in range(len(diff) - 1, 0, -1):
        diff[s] = (diff[s] - diff[s - 1]) & 0xF
    row = _pack_bits(diff, 4, 19)
    body = zlib.compress(row)
    p = _pdf(
        b"/Length " + str(len(body)).encode()
        + b" /Filter /FlateDecode /DecodeParms <</Predictor 2 /Columns "
        + str(cols).encode() + b" /BitsPerComponent 4>>",
        body,
    )
    assert pdf_extract_text(p) == "sub-byte"


# ---------------------------------------------------------------------------
# Incremental updates: only the LIVE version of each object extracts
# (NOTES r10 honest-limit closure — scan kept the FIRST occurrence)
# ---------------------------------------------------------------------------


def _content_obj(num: int, gen: int, text: bytes) -> bytes:
    body = b"BT (" + text + b") Tj ET"
    return (
        str(num).encode() + b" " + str(gen).encode() + b" obj\n<</Length "
        + str(len(body)).encode() + b">>\nstream\n" + body
        + b"\nendstream\nendobj\n"
    )


def test_pdf_incremental_update_supersedes_original():
    from debgpt7_8_with_vectordb_spark.sources.readers import (
        pdf_extract_text,
    )

    base = (
        b"%PDF-1.4\n" + _content_obj(1, 0, b"original")
        + b"trailer\n<<>>\nstartxref\n0\n%%EOF\n"
    )
    # without an update, the original extracts
    assert pdf_extract_text(base) == "original"
    # appended update: same object number, later position wins — the
    # stale original must NOT extract alongside it
    updated = base + (
        _content_obj(1, 0, b"revised")
        + b"trailer\n<<>>\nstartxref\n0\n%%EOF\n"
    )
    assert pdf_extract_text(updated) == "revised"
    # a reused number at a HIGHER generation supersedes regardless of
    # position ordering quirks
    gen_bump = base + (
        _content_obj(1, 1, b"gen1")
        + b"trailer\n<<>>\nstartxref\n0\n%%EOF\n"
    )
    assert pdf_extract_text(gen_bump) == "gen1"
    # distinct object numbers are unaffected: both extract, file order
    multi = (
        b"%PDF-1.4\n" + _content_obj(1, 0, b"one") + _content_obj(2, 0, b"two")
        + b"trailer\n<<>>\nstartxref\n0\n%%EOF\n"
        + _content_obj(1, 0, b"one-v2")
        + b"trailer\n<<>>\nstartxref\n0\n%%EOF\n"
    )
    assert pdf_extract_text(multi) == "two\none-v2"


def test_pdf_incremental_update_font_object_precedence():
    """The object index must also resolve /Font references to the LIVE
    font object: an appended update that replaces a font's /ToUnicode
    CMap changes how the glyph codes decode."""
    import zlib

    from debgpt7_8_with_vectordb_spark.sources.readers import (
        pdf_extract_text,
    )

    def cmap_obj(num: int, target: bytes) -> bytes:
        cm = (
            b"begincmap\n"
            b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
            b"1 beginbfchar\n<01> <00" + target
            + b">\nendbfchar\nendcmap\n"
        )
        body = zlib.compress(cm)
        return (
            str(num).encode() + b" 0 obj\n<</Length "
            + str(len(body)).encode()
            + b" /Filter /FlateDecode>>\nstream\n" + body
            + b"\nendstream\nendobj\n"
        )

    page = (
        b"3 0 obj\n<</Resources <</Font <</F1 4 0 R>>>>>>\nendobj\n"
        b"4 0 obj\n<</Type /Font /ToUnicode 5 0 R>>\nendobj\n"
    )
    content = b"BT /F1 Tf <01> Tj ET"
    stream = (
        b"6 0 obj\n<</Length " + str(len(content)).encode()
        + b">>\nstream\n" + content + b"\nendstream\nendobj\n"
    )
    base = (
        b"%PDF-1.4\n" + page + cmap_obj(5, b"41") + stream
        + b"trailer\n<<>>\nstartxref\n0\n%%EOF\n"
    )
    assert pdf_extract_text(base) == "A"  # <01> -> U+0041
    updated = base + cmap_obj(5, b"5A") + b"startxref\n0\n%%EOF\n"
    assert pdf_extract_text(updated) == "Z"  # live CMap maps to U+005A


# ---------------------------------------------------------------------------
# TeX Computer Modern base encodings (NOTES r10 honest-limit closure):
# subset CM fonts without /ToUnicode or /Differences decode through the
# published TeX encodings — OMS (cmsy), OT1 (cmr family), OML (cmmi)
# ---------------------------------------------------------------------------


def _tex_font_pdf(basefont: bytes, content: bytes) -> bytes:
    return (
        b"%PDF-1.4\n"
        b"1 0 obj\n<</Type /Page /Resources <</Font <</F1 5 0 R>>>>>>\n"
        b"endobj\n"
        b"5 0 obj\n<</Type /Font /Subtype /Type1 /BaseFont /" + basefont
        + b">>\nendobj\n"
        b"2 0 obj\n<</Length " + str(len(content)).encode() + b">>\nstream\n"
        + content + b"\nendstream\nendobj\n"
        b"trailer\n<<>>\n%%EOF"
    )


def test_pdf_tex_base_encodings():
    # cmsy: code 15 is the itemize bullet (the libtasn1 case), 32/33
    # the arrows; subset prefix on the name is the common form
    p = _tex_font_pdf(
        b"KGFModU+CMSY10", b"BT /F1 10 Tf <0F2021> Tj ET"
    )
    assert pdf_extract_text(p) == "∙←→"
    # cmr (OT1): fi/fl ligatures at 12/13, em-dash at 124; plain ASCII
    # letters pass through the latin-1 fallback untouched
    p2 = _tex_font_pdf(b"ABCDEF+CMR10", b"BT /F1 10 Tf (\x0cne \x0day|abc) Tj ET")
    assert pdf_extract_text(p2) == "fine flay—abc"
    # cmmi (OML): Greek lowercase block starts at 11
    p3 = _tex_font_pdf(b"CMMI12", b"BT /F1 12 Tf <0B0C> Tj ET")
    assert pdf_extract_text(p3) == "αβ"
    # a ToUnicode CMap still wins over the base-encoding fallback
    cmap = (
        b"begincmap\n"
        b"1 begincodespacerange\n<00> <FF>\nendcodespacerange\n"
        b"1 beginbfchar\n<0F> <0051>\nendbfchar\n"
        b"endcmap\n"
    )
    p4 = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<</Type /Page /Resources <</Font <</F1 5 0 R>>>>>>\n"
        b"endobj\n"
        b"5 0 obj\n<</Type /Font /BaseFont /CMSY10 /ToUnicode 7 0 R>>\n"
        b"endobj\n"
        b"7 0 obj\n<</Length " + str(len(cmap)).encode() + b">>\nstream\n"
        + cmap + b"\nendstream\nendobj\n"
        b"2 0 obj\n<</Length 22>>\nstream\n"
        b"BT /F1 10 Tf <0F> Tj ET\nendstream\nendobj\n"
        b"trailer\n<<>>\n%%EOF"
    )
    assert pdf_extract_text(p4) == "Q"
    # non-CM fonts are untouched (no table, latin-1 fallback)
    p5 = _tex_font_pdf(b"Helvetica", b"BT /F1 10 Tf (plain) Tj ET")
    assert pdf_extract_text(p5) == "plain"


def test_pdf_tex_encoding_real_manual_bullets():
    """The 38 itemize bullets in the container's TeX-produced libtasn1
    manual are cmsy code 15 in an ObjStm-packed subset font without
    ToUnicode — they must surface as '∙', not raw control bytes."""
    import pathlib

    import pytest

    src = pathlib.Path("/usr/share/doc/libtasn1-doc/libtasn1.pdf")
    if not src.exists():
        pytest.skip("libtasn1 manual not in container")
    text = pdf_extract_text(src.read_bytes())
    assert text.count("∙") == 38
    assert "\x0f" not in text


def test_pdf_adobe_symbol_base_encoding():
    """Adobe Symbol (PDF 1.7 Annex D.5) without ToUnicode: Greek rides
    the latin letter slots; math slots map; StandardEncoding-coincident
    bytes fall through latin-1 untouched."""
    p = _tex_font_pdf(b"Symbol", b"BT /F1 10 Tf (abgd) Tj ET")
    assert pdf_extract_text(p) == "αβγδ"
    p2 = _tex_font_pdf(b"KGHIJK+Symbol", b"BT /F1 10 Tf (W) Tj <B7A5> Tj ET")
    assert pdf_extract_text(p2) == "Ω•∞"
    # a font merely CONTAINING 'Symbol' in a longer name is not matched
    p3 = _tex_font_pdf(b"MySymbolic-Sans", b"BT /F1 10 Tf (abgd) Tj ET")
    assert pdf_extract_text(p3) == "abgd"


def test_pdf_obj_pattern_inside_stream_body_is_not_a_header():
    """Compressed bytes can coincidentally spell 'N G obj'; with
    latest-wins incremental precedence such a match must NOT displace
    the real object or mark it superseded (the match is masked because
    it falls inside a stream body)."""
    import zlib

    decoy_content = b"\x80noise 1 0 obj <<>> garbage endobj noise\x80"
    decoy = zlib.compress(decoy_content, 0)  # stored blocks: literal bytes
    assert b"1 0 obj" in decoy
    p = (
        b"%PDF-1.4\n"
        + _content_obj(1, 0, b"real")
        + b"startxref\n0\n%%EOF\n"
        # appended revision carrying the decoy stream (object 9)
        + b"9 0 obj\n<</Length " + str(len(decoy)).encode()
        + b" /Filter /FlateDecode>>\nstream\n" + decoy
        + b"\nendstream\nendobj\n"
        + b"startxref\n0\n%%EOF\n"
    )
    assert pdf_extract_text(p) == "real"
