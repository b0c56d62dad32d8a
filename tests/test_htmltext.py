"""Round-7 bs4-grade HTML extraction (VERDICT r6 #2): the default
extractor is a real stdlib tokenizer — entities, comments, script/style
CDATA bodies, quoted-attr '>', block-element newlines — plus the
reference's normalize pipeline (reader.py:462-466). Differential test
vs real bs4 runs whenever bs4 is importable."""

from __future__ import annotations

import pytest

from debgpt7_8_with_vectordb_spark.functions.htmltext import (
    DUCKDB_NORMALIZE,
    html_to_text,
    normalize_extracted,
)


def test_entities_named_numeric_hex():
    assert html_to_text("<p>a &amp; b &lt;c&gt; &#65; &#x42; &mdash;</p>") == (
        "a & b <c> A B —"
    )
    # double-escaped stays single-decoded
    assert html_to_text("<p>&amp;amp;</p>") == "&amp;"


def test_script_style_template_bodies_excluded():
    html = (
        "<style>p { color: red }</style>"
        '<script>var s = "<p>not text</p>"; if (a < b) {}</script>'
        "<template><p>inert</p></template>"
        "<p>visible</p>"
    )
    assert html_to_text(html) == "visible"


def test_comments_doctype_cdata_pi_dropped():
    html = (
        "<!DOCTYPE html><!-- top --><p>a</p><![CDATA[ raw ]]>"
        "<?php echo 1 ?><!-- <p>fake</p> --><p>b</p>"
    )
    assert html_to_text(html) == "a\n\nb"


def test_quoted_attr_gt_does_not_end_tag():
    """The failure a regexp stripper can't avoid: '>' inside a quoted
    attribute value."""
    assert html_to_text('<div title="a>b">ok</div>') == "ok"
    assert html_to_text("<a href='x?y>z'>link</a> t") == "link t"


def test_block_newlines_and_inline_flow():
    got = html_to_text(
        "<h1>H</h1><p>one <b>two</b> three</p><ul><li>i1</li><li>i2</li></ul>"
        "<div>d1<br>d2<br/>d3</div>"
    )
    assert got == "H\n\none two three\n\ni1\ni2\n\nd1\nd2\nd3"


def test_reference_normalize_pipeline():
    """strip -> collapse 3+ newline runs to a blank line -> rstrip each
    line (reader.py:464-466)."""
    assert normalize_extracted("\n\n a \t\nb  \n\n\n\nc\n\n") == "a\nb\n\nc"
    assert normalize_extracted("x") == "x"
    assert normalize_extracted("") == ""


def test_interior_whitespace_preserved():
    """bs4 get_text does NOT collapse interior runs of spaces — neither
    do we (the old regexp chain did; that was the divergence)."""
    assert html_to_text("<p>Hello   world</p>") == "Hello   world"


def test_malformed_markup_never_raises():
    for bad in (
        "<p unclosed",
        "</closes><nothing>",
        "<p><b>mis</p></b>nested",
        "<" * 50,
        "&#xZZ; &unknown; &",
        "<p>a<![CDATA[ open",
        "\x00<p>nul</p>",
    ):
        html_to_text(bad)  # must not raise


def test_duckdb_normalize_template_matches_python():
    """The oracle-side normalize is the byte-exact twin of the engine
    side — differential over adversarial whitespace strings."""
    import random

    import duckdb

    con = duckdb.connect()
    rng = random.Random(11)
    alphabet = list("ab c\t\n\r\f\v xyz — ")
    for _ in range(800):
        s = "".join(
            rng.choice(alphabet) for _ in range(rng.randrange(0, 50))
        )
        got = con.execute(
            "SELECT " + DUCKDB_NORMALIZE.format(e="?"), [s]
        ).fetchone()[0]
        assert got == normalize_extracted(s), repr(s)


bs4 = pytest.importorskip("bs4", reason="bs4 not installed in container")


def test_differential_vs_bs4():
    """When bs4 IS present: on markup without block-structure ambiguity
    our extraction equals BeautifulSoup(html,'html.parser').get_text()
    put through the same normalize pipeline."""
    fixtures = [
        "<p>a &amp; b</p>",
        '<div title="a>b">ok</div>',
        "<script>var x = 1;</script><p>vis</p>",
        "<!-- c --><p>t</p>",
        "<p>Hello   world</p>",
    ]
    for html in fixtures:
        ours = html_to_text(html)
        theirs = normalize_extracted(
            bs4.BeautifulSoup(html, features="html.parser").get_text("\n")
        )
        # bs4 get_text('\n') separates siblings; ours may emit extra
        # blank lines at block boundaries — compare modulo blank lines
        assert [l for l in ours.split("\n") if l] == [
            l for l in theirs.split("\n") if l
        ], html
