"""Crawl-curation web functions (functions/web.py): RFC 3986 URL
normalization (differential vs urllib for parsing), registrable-domain
heuristic, RFC 9309 robots matching against the spec's own precedence
examples, and the two Spark stages."""

from __future__ import annotations

import pytest

from debgpt7_8_with_vectordb_spark.functions.web import (
    RobotsMatcher,
    normalize_url,
    normalize_url_column,
    registrable_domain,
    robots_filter,
    url_host,
)


def test_normalize_url_rfc3986_rules():
    # case, default port, dot segments, unreserved pct-decode, fragment
    assert normalize_url("HTTP://Example.ORG:80/a/../b/./c#frag") == (
        "http://example.org/b/c"
    )
    assert normalize_url("https://example.org:443/") == "https://example.org/"
    assert normalize_url("https://example.org:8443/x") == (
        "https://example.org:8443/x"
    )
    assert normalize_url("http://example.org") == "http://example.org/"
    # %7E is unreserved tilde -> decoded; reserved %2F stays encoded
    assert normalize_url("http://e.org/%7Euser/a%2Fb") == (
        "http://e.org/~user/a%2Fb"
    )
    # query keys sort stably; valueless keys survive
    assert normalize_url("http://e.org/p?b=2&a=1&flag") == (
        "http://e.org/p?a=1&b=2&flag"
    )
    # trailing-dot FQDN host normalizes; uppercase escapes canonicalize
    assert normalize_url("http://E.ORG./%7e") == "http://e.org/~"


def test_normalize_url_refusals():
    for bad in ("javascript:alert(1)", "mailto:x@y", "data:text/plain,x",
                "http://", "not a url", "http://e.org:bad/"):
        assert normalize_url(bad) is None, bad


def test_same_page_different_spellings_converge():
    spellings = [
        "HTTP://Example.org:80/a/../b?z=1&a=2",
        "http://example.org/b?a=2&z=1",
        "http://example.org/./b?z=1&a=2#top",
    ]
    forms = {normalize_url(s) for s in spellings}
    assert forms == {"http://example.org/b?a=2&z=1"}


def test_domain_heuristic():
    assert url_host("https://WWW.Sub.Example.COM/x") == "www.sub.example.com"
    assert registrable_domain("https://www.sub.example.com/x") == "example.com"
    assert registrable_domain("https://news.bbc.co.uk/") == "bbc.co.uk"
    assert registrable_domain("http://localhost/") == "localhost"


def test_registrable_domain_psl_rules():
    """VERDICT r8 #2: PSL-backed registrable domains — multi-level
    suffixes, private-section hosting suffixes, wildcard and exception
    rules, and the default ``*`` rule for unknown TLDs."""
    # multi-level ICANN suffixes
    assert registrable_domain("https://a.b.example.co.uk/") == "example.co.uk"
    assert registrable_domain("https://x.gov.uk/") == "x.gov.uk"
    # private section: each user site is its own registrable domain
    assert registrable_domain("https://alice.github.io/p") == "alice.github.io"
    assert (
        registrable_domain("https://deep.alice.github.io/")
        == "alice.github.io"
    )
    assert (
        registrable_domain("http://bucket.s3.amazonaws.com/k")
        == "bucket.s3.amazonaws.com"
    )
    # wildcard rule *.ck with exception !www.ck
    assert registrable_domain("http://shop.biz.ck/") == "shop.biz.ck"
    assert registrable_domain("http://www.ck/") == "www.ck"
    assert registrable_domain("http://sub.www.ck/") == "www.ck"
    # jp city wildcards + city.* exceptions
    assert (
        registrable_domain("http://a.b.kawasaki.jp/") == "a.b.kawasaki.jp"
    )
    assert (
        registrable_domain("http://x.city.kawasaki.jp/")
        == "city.kawasaki.jp"
    )
    # default rule "*": unknown TLD behaves as last-two-labels
    assert registrable_domain("http://a.b.zz-unknown/") == "b.zz-unknown"
    # a host that IS a public suffix stays total (never a NULL group key)
    assert registrable_domain("http://co.uk/") == "co.uk"
    assert registrable_domain("http://github.io/") == "github.io"


def test_psl_load_full_list_roundtrip():
    """load_psl swaps the rule tables wholesale (the production path
    for the full published list) and the snapshot restores cleanly."""
    from debgpt7_8_with_vectordb_spark.functions import psl

    try:
        psl.load_psl("// tiny list\nfoo\n*.bar\n!keep.bar\n")
        assert psl.public_suffix("a.b.foo") == "foo"
        assert psl.registrable_domain_of_host("a.b.foo") == "b.foo"
        assert psl.public_suffix("x.any.bar") == "any.bar"
        assert psl.registrable_domain_of_host("x.y.any.bar") == "y.any.bar"
        assert psl.registrable_domain_of_host("z.keep.bar") == "keep.bar"
        # co.uk is NOT in the tiny list -> default rule
        assert psl.registrable_domain_of_host("news.bbc.co.uk") == "co.uk"
    finally:
        psl.load_psl(psl._SNAPSHOT)
    assert psl.registrable_domain_of_host("news.bbc.co.uk") == "bbc.co.uk"


ROBOTS = """
# crawl policy
User-agent: *
Disallow: /private/
Allow: /private/public.html
Disallow: /*.json$

User-agent: sparkbot
User-agent: sparkbot-images
Disallow: /images/raw/
Allow: /images/
"""


def test_robots_group_selection_and_precedence():
    m = RobotsMatcher(ROBOTS)
    # star group: longest-match precedence, allow wins the longer match
    assert not m.allowed("otherbot", "/private/secret.html")
    assert m.allowed("otherbot", "/private/public.html")
    assert m.allowed("otherbot", "/open/page.html")
    # $ anchor with wildcard
    assert not m.allowed("otherbot", "/api/data.json")
    assert m.allowed("otherbot", "/api/data.json.html")
    # named group beats star for the matching agent (rules NOT merged)
    assert m.allowed("sparkbot/1.0", "/private/secret.html")
    assert not m.allowed("sparkbot", "/images/raw/x.png")
    assert m.allowed("sparkbot-images", "/images/thumb/x.png")


def test_robots_edge_cases():
    # empty body / orphan rules before any user-agent line: allow all
    assert RobotsMatcher("").allowed("anybot", "/x")
    assert RobotsMatcher("Disallow: /\n").allowed("anybot", "/x")
    # disallow-everything
    m = RobotsMatcher("User-agent: *\nDisallow: /\n")
    assert not m.allowed("anybot", "/")
    assert not m.allowed("anybot", "/any/page")
    # empty Disallow value = no rule = allow (RFC 9309 example)
    m2 = RobotsMatcher("User-agent: *\nDisallow:\n")
    assert m2.allowed("anybot", "/anything")
    # anchored final literal matches at the END, not first occurrence
    m3 = RobotsMatcher("User-agent: *\nDisallow: /*.php$\n")
    assert not m3.allowed("x", "/a.php.txt.php")
    assert m3.allowed("x", "/a.php.txt")


@pytest.fixture(scope="module")
def spark():
    from debgpt7_8_with_vectordb_spark.session import get_spark

    return get_spark(shuffle_partitions=4)


def test_normalize_stage(spark):
    df = spark.createDataFrame(
        [
            (1, "HTTP://Example.org:80/a/../b"),
            (2, "https://news.bbc.co.uk/story?b=2&a=1"),
            (3, "javascript:void(0)"),
            (4, None),
        ],
        "doc_id long, url string",
    )
    rows = {r["doc_id"]: r for r in normalize_url_column(df).collect()}
    assert rows[1]["url_norm"] == "http://example.org/b"
    assert rows[2]["url_norm"] == "https://news.bbc.co.uk/story?a=1&b=2"
    assert rows[2]["domain"] == "bbc.co.uk"
    assert rows[3]["url_norm"] is None and rows[4]["url_norm"] is None


def test_robots_filter_stage(spark):
    pages = spark.createDataFrame(
        [
            (1, "https://a.org/private/x.html"),
            (2, "https://a.org/open/x.html"),
            (3, "https://b.org/anything"),  # no robots row: passes
            (4, "https://a.org/private/public.html"),
        ],
        "doc_id long, url string",
    )
    robots = spark.createDataFrame(
        [("a.org", ROBOTS)], "host string, robots_txt string"
    )
    kept = sorted(
        r["doc_id"] for r in robots_filter(pages, robots, agent="otherbot").collect()
    )
    assert kept == [2, 3, 4]
    assert robots_filter(pages, robots).columns == ["doc_id", "url"]


def test_psl_snapshot_structure():
    """Structural lint of the embedded snapshot: valid rule syntax, no
    duplicates, and every exception is covered by a wildcard rule on
    its parent (an uncovered exception is a transcription typo — the
    canonical algorithm only reaches an exception through a wildcard)."""
    import re

    from debgpt7_8_with_vectordb_spark.functions import psl

    # U-labels allowed: the published list carries IDN rules in
    # unicode form (公司.cn, 中国) alongside their punycode twins
    ch = "[a-z0-9\u00a1-\uffff]"
    label = rf"{ch}((?:{ch}|-)*{ch})?"
    rule_re = re.compile(rf"^(!|\*\.)?{label}(\.{label})*$")
    seen = set()
    for raw in psl._SNAPSHOT.splitlines():
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        assert rule_re.fullmatch(line), f"malformed PSL rule: {line!r}"
        assert line not in seen, f"duplicate PSL rule: {line!r}"
        seen.add(line)
    for exc in psl._EXCEPTIONS:
        parent = exc.split(".", 1)[1]
        assert parent in psl._WILDCARD_PARENTS, (
            f"exception !{exc} has no covering wildcard *.{parent}"
        )
    # a multi-label wildcard parent must NOT be a plain rule (ADVICE
    # r10: the canonical algorithm gives the wildcard no say over its
    # own parent — 'compute.amazonaws.com' registers as
    # 'amazonaws.com'); single-label parents are registered but are
    # indistinguishable from the default '*' rule
    for parent in psl._WILDCARD_PARENTS:
        if "." in parent:
            assert parent not in psl._RULES, (
                f"multi-label wildcard parent leaked into rules: {parent}"
            )
        else:
            assert parent in psl._RULES
