"""HTML → text extraction, bs4-grade, zero dependencies (round 7;
VERDICT r6 #2).

The reference extracts web text with ``BeautifulSoup(html,
'html.parser').get_text().strip()`` then collapses blank runs and
rstrips lines (reader.py:462-466, 529-533). Its fidelity comes from
using a real HTML tokenizer, not a tag regexp: entities decode
(``&amp;``/numeric), comments and doctypes vanish, a ``>`` inside a
quoted attribute doesn't end the tag, and script/style bodies are
tokenized as raw text (CDATA content model) rather than re-parsed.

``html_to_text`` reproduces that with the stdlib ``html.parser``
tokenizer — the same one bs4's 'html.parser' backend wraps — plus the
one upgrade a minified-HTML corpus needs: block-element boundaries emit
newlines (bs4's plain ``get_text()`` only preserves newlines that
happen to exist in the source markup, so single-line HTML collapses to
one unreadable line). The post-pipeline is the reference's, with one
deliberate difference: whitespace classes are explicit ASCII, so the
transform is expressible in both Spark SQL and DuckDB and the oracle
hash is engine-exact (Python's unicode ``str.strip`` would diverge
from RE2's ``\\s`` on NBSP-class corpora).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Content of these elements is not text (script/style are CDATA-model;
# template is inert DOM).
_SKIP_CONTENT = {"script", "style", "template"}

# Elements whose start/end implies a line boundary in rendered text.
_BLOCK = {
    "html", "head", "body", "p", "div", "br", "hr",
    "h1", "h2", "h3", "h4", "h5", "h6",
    "ul", "ol", "li", "dl", "dt", "dd",
    "table", "thead", "tbody", "tfoot", "tr", "caption",
    "section", "article", "header", "footer", "nav", "aside", "main",
    "blockquote", "pre", "form", "fieldset", "figure", "figcaption",
    "address",
}

_ASCII_WS = " \t\n\r\f\v"


class _TextExtractor(HTMLParser):
    def __init__(self) -> None:
        # convert_charrefs=True (the default) decodes &amp;/&#123;/&#x1F;
        # inside data runs — the entity half of bs4 parity
        super().__init__(convert_charrefs=True)
        self._skip = 0
        self._out: list[str] = []

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_CONTENT:
            self._skip += 1
        if tag in _BLOCK:
            self._out.append("\n")

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_CONTENT and self._skip:
            self._skip -= 1
        if tag in _BLOCK:
            self._out.append("\n")

    def handle_startendtag(self, tag: str, attrs) -> None:  # <br/>
        if tag in _BLOCK:
            self._out.append("\n")

    def handle_data(self, data: str) -> None:
        if not self._skip:
            self._out.append(data)

    # comments, doctype, CDATA-ish declarations, processing
    # instructions: all dropped, matching bs4's default get_text
    def handle_comment(self, data: str) -> None:
        pass

    def handle_decl(self, decl: str) -> None:
        pass

    def unknown_decl(self, data: str) -> None:
        pass

    def handle_pi(self, data: str) -> None:
        pass

    def text(self) -> str:
        return "".join(self._out)


def normalize_extracted(text: str) -> str:
    """The reference's post-extraction pipeline (reader.py:464-466) in
    explicit-ASCII form: strip the ends, collapse runs of 3+ newlines to
    a blank line (``\\n\\n+\\n → \\n\\n``), rstrip each line."""
    text = text.strip(_ASCII_WS)
    text = re.sub("\n\n+\n", "\n\n", text)
    return "\n".join(x.rstrip(_ASCII_WS) for x in text.split("\n"))


def html_to_text(html: str) -> str:
    """bs4-grade HTML → text: real tokenizer (entities, comments,
    quoted-attr '>', script/style CDATA bodies) + block-element
    newlines + the reference's normalize pipeline."""
    p = _TextExtractor()
    try:
        p.feed(html)
        p.close()
    except Exception:
        # tokenizer choked mid-document (pathological markup): keep
        # whatever text was recovered — never fail the task
        pass
    return normalize_extracted(p.text())


def extract_html_text(df, html_col: str = "html", id_col: str = "doc_id"):
    """Arrow-batched extraction stage: (id, html) → (id, stripped) via
    ``html_to_text``. NULL html yields NULL stripped (same propagation
    as the SQL `||` chain an oracle uses to render the fixture). Zero
    shuffle, scan-parallel — the decode-heavy stage of a crawl-curation
    pipeline; at 100 TB this is the same seam with lxml/bs4 swapped in
    via readers.default_html_extractor."""
    import pandas as pd

    def run(batches):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "stripped": [
                        None if h is None else html_to_text(h)
                        for h in pdf[html_col]
                    ],
                }
            )

    return df.mapInPandas(run, "doc_id long, stripped string")


# normalize_extracted as a DuckDB expression template ({e} = input
# expression), stage order identical to the Python pipeline: strip ends
# -> collapse 3+ newline runs -> rstrip lines. trim()'s char-set arg
# takes LITERAL characters (DuckDB strings don't process backslash
# escapes), hence chr(); regex args go to RE2 which interprets \n/\t
# escapes itself. RE2 has no lookahead, so per-line rstrip is the
# before-\n pass plus a final-$ pass.
DUCKDB_NORMALIZE = (
    "regexp_replace(regexp_replace(regexp_replace("
    "trim({e}, ' ' || chr(9) || chr(10) || chr(13) || chr(12) || chr(11)), "
    "'\\n\\n+\\n', chr(10) || chr(10), 'g'), "
    "'[ \\t\\r\\f\\v]+\\n', chr(10), 'g'), "
    "'[ \\t\\r\\f\\v]+$', '')"
)
