"""Canonical publicsuffix.org test vectors (VERDICT r9 #3) + the
executor-propagation fix for a deploy-time full-list load (ADVICE r9).

The vector file is the public-domain checkPublicSuffix data published
with the list; expected ``null`` means "no registrable domain" — the
engine's registrable_domain_of_host is a TOTAL function by design
(quota keys must never be NULL), so null vectors assert the
host-is-its-own-suffix identity instead.
"""

from __future__ import annotations

import re
from pathlib import Path

from debgpt7_8_with_vectordb_spark.functions import psl

VECTORS = Path(__file__).parent / "data" / "psl_test_vectors.txt"

_LINE = re.compile(
    r"checkPublicSuffix\((null|'(?P<host>[^']*)'),\s*"
    r"(null|'(?P<want>[^']*)')\);"
)


def _load_vectors():
    cases = []
    for raw in VECTORS.read_text(encoding="utf-8").splitlines():
        line = raw.strip()
        if not line or line.startswith("//"):
            continue
        m = _LINE.fullmatch(line)
        assert m, f"unparseable vector line: {line!r}"
        cases.append((m.group("host"), m.group("want")))
    return cases


def _norm(host: str) -> str:
    # the engine's contract: hosts arrive lowercased and dot-stripped
    # (url_host does this); the canonical file feeds raw spellings
    return host.strip(".").lower()


def test_canonical_psl_vectors():
    cases = _load_vectors()
    assert len(cases) >= 75  # the full published set (minus the commented-out 'local' block)
    ran = 0
    for host, want in cases:
        if host is None:  # the null-input line: nothing to normalize
            continue
        h = _norm(host)
        if not h:
            continue  # '.com'-style inputs normalize to a bare suffix
        got = psl.registrable_domain_of_host(h)
        if want is None:
            # canonical "no registrable domain": host IS a public
            # suffix (or unlisted single label) — total-function
            # semantics return the host itself
            assert got == h, f"{host}: want self (null), got {got}"
        else:
            assert got == want, f"{host}: want {want}, got {got}"
        ran += 1
    assert ran >= 70


def test_canonical_public_suffix_identity():
    # every expected-null listed host must literally be a public suffix
    # (leading-dot vectors are null for INVALIDITY, not suffix-ness —
    # the engine's url_host normalization strips them upstream)
    for host, want in _load_vectors():
        if host is None or want is not None or host.startswith("."):
            continue
        h = _norm(host)
        if h:
            assert psl.public_suffix(h) == h


def test_psl_rules_pickle_roundtrip():
    import pickle

    rules = psl.current_rules()
    clone = pickle.loads(pickle.dumps(rules))
    assert clone.rules == rules.rules
    assert clone.wildcard_parents == rules.wildcard_parents
    assert clone.exceptions == rules.exceptions
    assert clone.registrable_domain_of_host("a.b.example.co.uk") == (
        "example.co.uk"
    )
    # the per-instance cache is dropped on pickle, rebuilt on use
    assert clone.suffix_label_count("x.ide.kyoto.jp") == 3


def test_loaded_rules_reach_executors(spark):
    """ADVICE r9 (medium): a driver-side load_psl must govern the
    distributed Arrow pass — normalize_url_column captures the driver's
    tables at plan-build time, so executor workers (which import psl
    fresh and would otherwise fall back to the embedded snapshot) apply
    the loaded list."""
    from debgpt7_8_with_vectordb_spark.functions.web import (
        normalize_url_column,
    )

    df = spark.createDataFrame(
        [("https://a.b.custom-registry.zz/x",)], ["url"]
    )
    try:
        # a private suffix that exists ONLY in the loaded list
        psl.load_psl(psl._SNAPSHOT + "\ncustom-registry.zz\n")
        got = normalize_url_column(df, "url").select("domain").collect()
        assert got[0][0] == "b.custom-registry.zz"
    finally:
        psl.load_psl(psl._SNAPSHOT)
    # and after restoring, a fresh plan uses the snapshot again
    got = normalize_url_column(df, "url").select("domain").collect()
    assert got[0][0] == "custom-registry.zz"


def test_aws_compute_wildcard():
    # the ADVICE example: EC2 public hostnames carry a REGION label
    # under the wildcard — each instance hostname is its own
    # registrable domain, region buckets are not merged
    assert (
        psl.registrable_domain_of_host(
            "ec2-1-2-3-4.us-east-1.compute.amazonaws.com"
        )
        == "ec2-1-2-3-4.us-east-1.compute.amazonaws.com"
    )
    assert (
        psl.public_suffix("ec2-1-2-3-4.us-east-1.compute.amazonaws.com")
        == "us-east-1.compute.amazonaws.com"
    )


def test_wildcard_parent_is_not_its_own_suffix():
    # ADVICE r10: the canonical algorithm gives a wildcard rule no say
    # over its own parent — host == the multi-label wildcard parent
    # matches only the default rule, so 'compute.amazonaws.com' under
    # '*.compute.amazonaws.com' (with 'com' a normal rule) registers
    # as 'amazonaws.com', not as itself.
    assert "compute.amazonaws.com" in psl._WILDCARD_PARENTS
    assert psl.public_suffix("compute.amazonaws.com") == "com"
    assert (
        psl.registrable_domain_of_host("compute.amazonaws.com")
        == "amazonaws.com"
    )
    # but a single-label wildcard parent stays total: the host IS the
    # suffix (same answer the default '*' rule gives)
    assert "ck" in psl._WILDCARD_PARENTS
    assert psl.public_suffix("ck") == "ck"
    assert psl.registrable_domain_of_host("ck") == "ck"
    # and one label under a multi-label wildcard parent is a suffix
    assert (
        psl.public_suffix("us-east-1.compute.amazonaws.com")
        == "us-east-1.compute.amazonaws.com"
    )


def test_no_municipality_tranche_r13():
    """VERDICT r12 #3: the .no municipality (kommune) block — ASCII
    names, IDN U-labels AND their stdlib-idna punycode twins, the
    published brønnøysund oddity, and the county-qualified forms for
    ambiguous kommune names. A host under an absent registry would
    over-merge to the default rule ('<kommune>.no' itself) — these pin
    the suffix depth."""
    rd = psl.registrable_domain_of_host
    # ASCII kommuner register one level beneath the municipality
    assert rd("www.etat.bergen.no") == "etat.bergen.no"
    assert rd("a.b.trondheim.no") == "b.trondheim.no"
    assert rd("x.stavanger.no") == "x.stavanger.no"
    assert rd("svc.alta.no") == "svc.alta.no"
    # IDN U-label and punycode twin agree
    assert rd("www.etat.tromsø.no") == "etat.tromsø.no"
    assert rd("www.etat.xn--troms-zua.no") == "etat.xn--troms-zua.no"
    assert rd("a.værøy.no") == "a.værøy.no"
    assert rd("a." + "værøy".encode("idna").decode() + ".no") == (
        "a.xn--vry-yla5g.no"
    )
    # transliterated ASCII forms are separate published rules
    assert rd("x.bronnoy.no") == "x.bronnoy.no"
    assert rd("x.brønnøysund.no") == "x.brønnøysund.no"
    # ambiguous names are county-qualified third-level suffixes
    assert rd("www.skole.bo.telemark.no") == "skole.bo.telemark.no"
    assert rd("www.a.heroy.nordland.no") == "a.heroy.nordland.no"
    assert rd("p.os.hordaland.no") == "p.os.hordaland.no"
    # an UNLISTED label under .no still registers at the second level
    assert rd("www.opera.no") == "opera.no"
    # county block unchanged by the tranche
    assert rd("x.gs.oslo.no") == "x.gs.oslo.no"
    # snapshot breadth contract for the round
    assert len(psl._RULES) + len(psl._EXCEPTIONS) >= 1500


def test_r13_private_platforms():
    rd = psl.registrable_domain_of_host
    assert rd("shop.myshopify.com") == "shop.myshopify.com"
    assert rd("a.b.myshopify.com") == "b.myshopify.com"
    assert rd("site.000webhostapp.com") == "site.000webhostapp.com"
    assert rd("x.csb.app") == "x.csb.app"
    assert rd("x.preview.csb.app") == "x.preview.csb.app"
    assert rd("demo.streamlit.app") == "demo.streamlit.app"
    assert rd("team.gitbook.io") == "team.gitbook.io"


def test_jp_municipality_tranche_r14():
    """VERDICT r13 #3: the .jp municipality ("jp addresses") tranche —
    third-level rules under the 47 prefecture second-levels. A host
    under an absent municipality falls back to the PREFECTURE rule
    (one level shallower), never to a wrong suffix; the seven
    designated-city wildcard families are second-level and
    unaffected."""
    rd = psl.registrable_domain_of_host
    # municipalities register one level beneath the third-level rule
    assert rd("www.kosodate.urayasu.chiba.jp") == "kosodate.urayasu.chiba.jp"
    assert rd("a.b.toyota.aichi.jp") == "b.toyota.aichi.jp"
    assert rd("www.lib.bunkyo.tokyo.jp") == "lib.bunkyo.tokyo.jp"
    assert rd("x.sakura.chiba.jp") == "x.sakura.chiba.jp"
    # pre-merger (defunct) municipalities are published rules
    assert rd("www.hazu.aichi.jp") == "www.hazu.aichi.jp"
    assert rd("x.usui.fukuoka.jp") == "x.usui.fukuoka.jp"
    # published long-vowel spellings (incl. the doubled honjo/honjyo)
    assert rd("a.happou.akita.jp") == "a.happou.akita.jp"
    assert rd("a.honjo.akita.jp") == "a.honjo.akita.jp"
    assert rd("a.honjyo.akita.jp") == "a.honjyo.akita.jp"
    assert rd("a.ohtawara.tochigi.jp") == "a.ohtawara.tochigi.jp"
    assert rd("a.minami-alps.yamanashi.jp") == "a.minami-alps.yamanashi.jp"
    # an UNLISTED municipality registers at the prefecture level
    assert rd("www.unlisted-town.chiba.jp") == "unlisted-town.chiba.jp"
    # the designated-city wildcard/exception family is untouched
    assert rd("a.b.kawasaki.jp") == "a.b.kawasaki.jp"
    assert rd("a.b.city.kawasaki.jp") == "city.kawasaki.jp"
    # same-named municipality in ANOTHER prefecture is an ordinary rule
    assert rd("x.kawasaki.miyagi.jp") == "x.kawasaki.miyagi.jp"
    assert rd("x.kawasaki.fukuoka.jp") == "x.kawasaki.fukuoka.jp"
    # the canonical publicsuffix.org vector municipality still holds
    assert rd("b.ide.kyoto.jp") == "b.ide.kyoto.jp"
    # organizational second-levels unaffected
    assert rd("www.example.co.jp") == "example.co.jp"
    # snapshot breadth contract for the round (VERDICT r13 #3: >= 3000)
    rules = psl.current_rules()
    assert len(rules.rules) + len(rules.exceptions) >= 3000
    jp3 = [x for x in rules.rules if x.endswith(".jp") and x.count(".") == 2]
    assert len(jp3) >= 1500


def test_every_plain_rule_registers_one_label_deeper():
    """Structural invariant over the ENTIRE snapshot: for every plain
    (non-wildcard, non-exception) rule R, a host one label beneath R
    is its own registrable domain. Catches a mis-transcribed rule that
    never matches (it would fall to a shorter rule and register at the
    wrong depth) — total coverage of all r9-r13 tranches at once."""
    rules = psl.current_rules()
    for r in rules.rules:
        host = "probe." + r
        got = psl.registrable_domain_of_host(host)
        assert got == host, f"rule {r!r}: {host} registered as {got}"


def test_every_idn_rule_has_punycode_twin():
    """Every non-ASCII (U-label) rule must ship its stdlib-idna
    punycode twin — hosts arrive in either form."""
    rules = psl.current_rules()
    for r in rules.rules:
        if r.isascii():
            continue
        twin = ".".join(
            p.encode("idna").decode("ascii") if not p.isascii() else p
            for p in r.split(".")
        )
        assert twin in rules.rules, f"IDN rule {r!r} missing twin {twin!r}"
