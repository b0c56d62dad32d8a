"""ADVICE r12 #2 closures (sources/readers.py font-encoding sniff).

1. A resolved indirect /Encoding object carrying ONLY /Differences
   suppresses the TeX by-name fallback — even when the Differences
   table parses empty (all-unknown glyph names), the font declared a
   custom encoding, so the built-in tables don't apply.
2. The inline /Encoding dict sniff is BALANCED: a /BaseEncoding placed
   after nested dict content is still seen (a non-greedy ``<<.*?>>``
   match stops at the first ``>>`` and would miss it).
"""

from debgpt7_8_with_vectordb_spark.sources.readers import (
    _font_base_encoding,
    _font_differences,
    _inline_encoding_value,
    pdf_extract_text,
)
from tests.test_advice_r11_pdf import _ASCII_PROBE, _font_pdf


def test_indirect_differences_only_suppresses_tex_fallback():
    # Differences with an unknown glyph name -> empty parse; the TeX
    # table must STILL be suppressed (custom encoding declared)
    assert (
        _font_base_encoding(
            b"/BaseFont /CMSY10 /Encoding 9 0 R",
            {9: b"<</Type /Encoding /Differences [1 /nosuchglyphname]>>"},
        )
        is None
    )
    # inline-dict form too
    assert (
        _font_base_encoding(
            b"/BaseFont /CMSY10 "
            b"/Encoding <</Differences [1 /nosuchglyphname]>>"
        )
        is None
    )
    # a plain /Type /Encoding dict (no Differences, no BaseEncoding)
    # still falls through to the table (r11 behavior preserved)
    assert (
        _font_base_encoding(
            b"/BaseFont /CMSY10 /Encoding 9 0 R", {9: b"<</Type /Encoding>>"}
        )
        is not None
    )


def test_inline_encoding_dict_balanced_nested():
    font = (
        b"/BaseFont /CMR10 /Encoding <</Foo <</Bar 1>> "
        b"/BaseEncoding /WinAnsiEncoding>> /Widths [1 2]"
    )
    enc = _inline_encoding_value(font)
    # the balanced value includes content past the nested >>
    assert enc is not None and b"/BaseEncoding" in enc
    assert enc.endswith(b"/BaseEncoding /WinAnsiEncoding>>")
    # so the standard-encoding suppression fires
    assert _font_base_encoding(font) is None
    # bare-name form and unterminated dict
    assert _inline_encoding_value(b"/Encoding /MacRomanEncoding") == (
        b"/MacRomanEncoding"
    )
    assert _inline_encoding_value(b"/Encoding <</Never closed") is None
    assert _inline_encoding_value(b"/Widths [1 2]") is None


def test_font_differences_sees_array_after_nested_dict():
    # nested dict BEFORE /Differences: the old non-greedy inline match
    # stopped at the first >> and never saw the array
    font = (
        b"/BaseFont /F1 /Encoding <</Meta <</X 1>> "
        b"/Differences [65 /bullet]>>"
    )
    got = _font_differences(font, {})
    assert got is not None
    width, table = got
    assert width == 1 and table[65] == "•"


def test_end_to_end_differences_only_cm_font_keeps_latin1():
    # end-to-end: CM-named font whose indirect encoding declares only
    # unknown Differences -> raw latin-1 passthrough, NOT OT1 remap
    enc = (
        b"7 0 obj\n<</Type /Encoding /Differences [1 /nosuchglyphname]>>\n"
        b"endobj\n"
    )
    p = _font_pdf(
        b"/Type /Font /Subtype /Type1 /BaseFont /ABCDEF+CMR10 "
        b"/Encoding 7 0 R",
        _ASCII_PROBE,
        extra=enc,
    )
    assert pdf_extract_text(p) == "a|b<c>d"


def test_font_resource_dict_balanced_inline_font_does_not_hide_refs():
    """Self-review r13: a /Font RESOURCE dict carrying an INLINE font
    dict used to end the non-greedy match at the inline dict's >>,
    dropping every ref declared after it — the resource dict is now
    matched balanced, so F2's ToUnicode still resolves."""
    cmap = (
        b"begincodespacerange <00> <FF> endcodespacerange\n"
        b"beginbfchar <61> <0041> endbfchar"
    )
    p = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<</Type /Page /Resources <</Font <<"
        b"/F1 <</Type /Font /Subtype /Type1 /BaseFont /Helvetica>> "
        b"/F2 5 0 R>>>>>>\nendobj\n"
        b"5 0 obj\n<</Type /Font /ToUnicode 7 0 R>>\nendobj\n"
        b"7 0 obj\n<</Length " + str(len(cmap)).encode()
        + b">>\nstream\n" + cmap + b"\nendstream\nendobj\n"
        b"2 0 obj\n<</Length 24>>\nstream\nBT /F2 10 Tf (a) Tj ET\nendstream\n"
        b"endobj\ntrailer\n<<>>\n%%EOF"
    )
    assert pdf_extract_text(p) == "A"  # F2's bfchar maps a -> A
