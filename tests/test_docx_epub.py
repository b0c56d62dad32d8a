"""DOCX/EPUB sources: zero-dep text extraction from the two ZIP-based
document containers (stdlib zipfile + the shared OOXML/HTML
extractors), suffix + prefix routing, and the quarantine contract."""

from __future__ import annotations

import io
import zipfile

import pytest

from debgpt7_8_with_vectordb_spark.sources.readers import (
    docx_extract_text,
    epub_extract_text,
    read_any_path,
)
from debgpt7_8_with_vectordb_spark.sources.registry import read as source_read


def _zip_bytes(members: dict[str, str], stored: bool = False) -> bytes:
    buf = io.BytesIO()
    comp = zipfile.ZIP_STORED if stored else zipfile.ZIP_DEFLATED
    with zipfile.ZipFile(buf, "w", comp) as z:
        for name, text in members.items():
            z.writestr(name, text)
    return buf.getvalue()


def _docx(document_xml: str, stored: bool = False) -> bytes:
    return _zip_bytes(
        {
            "[Content_Types].xml": "<Types/>",
            "word/document.xml": document_xml,
        },
        stored=stored,
    )


DOC_XML = (
    '<?xml version="1.0"?><w:document><w:body>'
    "<w:p><w:r><w:t>Hello</w:t></w:r><w:r><w:t xml:space=\"preserve\"> "
    "world &amp; friends</w:t></w:r></w:p>"
    "<w:p><w:r><w:t>Tabs:</w:t><w:tab/><w:t>after</w:t>"
    "<w:br/><w:t>newline</w:t></w:r></w:p>"
    "<w:p/></w:body></w:document>"
)


def test_docx_extraction_paragraphs_runs_entities():
    for stored in (False, True):
        text = docx_extract_text(_docx(DOC_XML, stored=stored))
        assert text == "Hello world & friends\nTabs:\tafter\nnewline"


def test_docx_malformed_is_empty():
    assert docx_extract_text(b"not a zip") == ""
    assert docx_extract_text(b"") == ""
    # a zip without word/document.xml is not a docx
    assert docx_extract_text(_zip_bytes({"mimetype": "text/plain"})) == ""


def _epub() -> bytes:
    container = (
        '<?xml version="1.0"?><container><rootfiles>'
        '<rootfile full-path="OEBPS/content.opf" '
        'media-type="application/oebps-package+xml"/>'
        "</rootfiles></container>"
    )
    opf = (
        '<?xml version="1.0"?><package><manifest>'
        '<item id="c2" href="ch2.xhtml" media-type="application/xhtml+xml"/>'
        '<item id="c1" href="text/ch1.xhtml" media-type="application/xhtml+xml"/>'
        '<item id="css" href="style.css" media-type="text/css"/>'
        "</manifest><spine>"
        '<itemref idref="c1"/><itemref idref="c2"/>'
        "</spine></package>"
    )
    ch1 = "<html><body><h1>One</h1><p>First &aacute; chapter.</p></body></html>"
    ch2 = "<html><body><p>Second chapter.</p><script>junk()</script></body></html>"
    return _zip_bytes(
        {
            "mimetype": "application/epub+zip",
            "META-INF/container.xml": container,
            "OEBPS/content.opf": opf,
            "OEBPS/text/ch1.xhtml": ch1,
            "OEBPS/ch2.xhtml": ch2,
            "OEBPS/style.css": "p{}",
        }
    )


def test_epub_extraction_spine_order_and_html_rules():
    text = epub_extract_text(_epub())
    # spine order (c1 before c2), entity decode, script stripped
    assert "One" in text and "First á chapter." in text
    assert text.index("First") < text.index("Second chapter.")
    assert "junk" not in text and "style" not in text


def test_epub_malformed_is_empty():
    assert epub_extract_text(b"PK\x03\x04 broken") == ""
    assert epub_extract_text(_zip_bytes({"mimetype": "application/epub+zip"})) == ""


@pytest.fixture(scope="module")
def spark():
    from debgpt7_8_with_vectordb_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


def test_sources_end_to_end(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("docs")
    (root / "a.docx").write_bytes(_docx(DOC_XML))
    (root / "b.epub").write_bytes(_epub())
    rows = source_read(spark, f"docx:{root}/a.docx").collect()
    assert len(rows) == 1 and rows[0]["content"].startswith("Hello world")
    rows = read_any_path(spark, f"{root}/b.epub").collect()
    assert len(rows) == 1 and "Second chapter." in rows[0]["content"]
