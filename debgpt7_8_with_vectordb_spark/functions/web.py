"""Crawl-curation web functions: URL normalization and robots.txt.

The companions to the WARC ingestion head (sources/readers.py
``read_warc``): before a 100 TB crawl is deduplicated or quota'd, URLs
must be canonical (the same page arrives as ``HTTP://Example.org:80/a/../b``
and ``http://example.org/b``) and disallowed paths must be dropped.

- ``normalize_url``: RFC 3986 §6 syntax-based normalization — scheme and
  host lowercased, default ports removed, dot-segments resolved,
  percent-encodings of unreserved characters decoded and the rest
  upper-cased, empty path -> "/" — plus the two curation-policy steps
  every pipeline applies (fragment dropped, query keys sorted stably).
- ``url_host`` / ``registrable_domain``: host extraction and
  Public-Suffix-List registrable domains (functions/psl.py: canonical
  publicsuffix.org algorithm over an embedded snapshot, full-list
  loadable at deploy time).
- ``RobotsMatcher``: RFC 9309 robots.txt evaluation — group selection by
  longest user-agent product-token match, longest-path-match rule
  precedence with allow winning ties, ``*`` and ``$`` wildcards,
  default-allow.

Spark stages run the pure functions through Arrow batches
(``normalize_url_column``, ``robots_filter``) — same seam discipline as
every other Python-side operator here.
"""

from __future__ import annotations

import re
from urllib.parse import urlsplit

from .psl import PSLRules, current_rules, registrable_domain_of_host

_DEFAULT_PORTS = {"http": "80", "https": "443", "ftp": "21"}
_PCT = re.compile(r"%([0-9A-Fa-f]{2})")


def _normalize_pct(text: str) -> str:
    """RFC 3986 §6.2.2.1-2: decode percent-escapes of UNRESERVED
    characters only (a blanket unquote would turn %2F into a literal
    '/' and change path semantics); uppercase the hex of everything
    else."""

    def fix(m: re.Match) -> str:
        ch = chr(int(m.group(1), 16))
        if ch.isascii() and (ch.isalnum() or ch in "-._~"):
            return ch
        return "%" + m.group(1).upper()

    return _PCT.sub(fix, text)


def _remove_dot_segments(path: str) -> str:
    out: list[str] = []
    for seg in path.split("/"):
        if seg == "..":
            if out and out[-1]:
                out.pop()
            continue
        if seg == ".":
            continue
        out.append(seg)
    norm = "/".join(out)
    if path.endswith(("/.", "/..")) and not norm.endswith("/"):
        norm += "/"
    if not norm.startswith("/"):
        norm = "/" + norm
    return norm


def normalize_url(url: str) -> str | None:
    """Canonical form per the module doc; None for unparseable input or
    non-http(s)/ftp schemes (data:, javascript:, mailto: are not crawl
    documents)."""
    try:
        parts = urlsplit(url.strip())
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https", "ftp"):
        return None
    host = parts.hostname
    if not host:
        return None
    host = host.rstrip(".").lower()
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme):
        netloc += f":{port}"
    path = _normalize_pct(_remove_dot_segments(parts.path or "/"))
    query = ""
    if parts.query:
        pairs = [
            tuple(p.split("=", 1)) if "=" in p else (p, None)
            for p in parts.query.split("&")
            if p
        ]
        pairs.sort(key=lambda kv: (kv[0], kv[1] or ""))
        query = "&".join(
            k if v is None else f"{k}={v}"
            for k, v in (
                (_normalize_pct(k), None if v is None else _normalize_pct(v))
                for k, v in pairs
            )
        )
    out = f"{scheme}://{netloc}{path}"
    if query:
        out += f"?{query}"
    return out  # fragment intentionally dropped


def url_host(url: str) -> str | None:
    try:
        host = urlsplit(url.strip()).hostname
    except ValueError:
        return None
    return host.rstrip(".").lower() if host else None


def registrable_domain(
    url: str, rules: "PSLRules | None" = None
) -> str | None:
    """Public-Suffix-List registrable domain (psl.py: the canonical
    publicsuffix.org algorithm over an embedded snapshot; swap in the
    full published list via ``psl.load_psl`` at deploy time). Unknown
    TLDs fall to the PSL default rule ``*`` — last-two-labels, the old
    heuristic — so the upgrade only refines multi-level suffixes
    (``co.uk``, ``github.io``, ``*.ck`` …). Distributed callers pass
    ``rules`` explicitly (captured driver-side via ``current_rules``)
    so a loaded full list reaches executor workers (ADVICE r9)."""
    host = url_host(url)
    if not host or "." not in host:
        return host
    if rules is not None:
        return rules.registrable_domain_of_host(host)
    return registrable_domain_of_host(host)


class RobotsMatcher:
    """RFC 9309 evaluation for ONE robots.txt body. Groups are selected
    by the longest user-agent token match (``*`` = fallback); within the
    group the longest-matching rule wins, allow beating disallow on
    equal length; no matching rule -> allowed."""

    def __init__(self, body: str) -> None:
        self.groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
        agents: list[str] = []
        rules: list[tuple[bool, str]] = []
        in_group_body = False
        for raw in body.splitlines():
            line = raw.split("#", 1)[0].strip()
            if not line or ":" not in line:
                continue
            key, _, value = line.partition(":")
            key = key.strip().lower()
            value = value.strip()
            if key == "user-agent":
                if in_group_body:
                    if agents:
                        self.groups.append((agents, rules))
                    agents, rules = [], []  # orphan rules never leak
                    in_group_body = False
                agents.append(value.lower())
            elif key in ("allow", "disallow"):
                in_group_body = True
                if value:
                    rules.append((key == "allow", value))
                elif key == "disallow":
                    pass  # empty disallow = allow everything (no rule)
        if agents:
            self.groups.append((agents, rules))

    def _rules_for(self, agent: str) -> list[tuple[bool, str]]:
        agent = agent.lower()
        best_len = -1
        best: list[tuple[bool, str]] = []
        star: list[tuple[bool, str]] = []
        for agents, rules in self.groups:
            for a in agents:
                if a == "*":
                    star = star or rules
                elif agent.startswith(a) and len(a) > best_len:
                    best_len, best = len(a), rules
        return best if best_len >= 0 else star

    @staticmethod
    def _match_len(pattern: str, path: str) -> int | None:
        """Length of the pattern if it matches the path (``*`` wildcard,
        ``$`` end anchor), else None — rule precedence is by pattern
        octet length (RFC 9309 §2.2.2)."""
        score = len(pattern)
        anchored = pattern.endswith("$")
        body = pattern[:-1] if anchored else pattern
        parts = body.split("*")
        if not path.startswith(parts[0]):
            return None
        pos = len(parts[0])
        for part in parts[1:-1]:
            idx = path.find(part, pos)
            if idx < 0:
                return None
            pos = idx + len(part)
        if len(parts) > 1:
            last = parts[-1]
            if anchored:  # final literal must end exactly at path end
                if not path.endswith(last) or len(path) - len(last) < pos:
                    return None
            elif path.find(last, pos) < 0:
                return None
        elif anchored and pos != len(path):
            return None
        return score

    def allowed(self, agent: str, path: str) -> bool:
        if not path.startswith("/"):
            path = "/" + path
        best = None  # (length, is_allow)
        for is_allow, pattern in self._rules_for(agent):
            ln = self._match_len(pattern, path)
            if ln is None:
                continue
            if best is None or ln > best[0] or (ln == best[0] and is_allow):
                best = (ln, is_allow)
        return True if best is None else best[1]


def normalize_url_column(df, url_col: str = "url"):
    """Arrow-batched stage: adds ``url_norm`` (canonical form or NULL)
    and ``domain`` (registrable-domain heuristic) columns — the keys a
    crawl dedup / domain-quota pass groups on. The DRIVER's active PSL
    tables are captured here at plan-build time and ride the task
    closure, so a deploy-time ``psl.load_psl`` reaches every executor
    worker (which would otherwise rebuild from the embedded snapshot —
    ADVICE r9)."""
    import pandas as pd

    cols = df.columns
    psl_rules = current_rules()  # driver-side snapshot, picklable

    def run(batches):
        for pdf in batches:
            urls = pdf[url_col].astype(object)
            pdf = pdf.copy()
            pdf["url_norm"] = [
                normalize_url(u) if isinstance(u, str) else None for u in urls
            ]
            pdf["domain"] = [
                registrable_domain(u, psl_rules)
                if isinstance(u, str)
                else None
                for u in urls
            ]
            yield pdf

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
    )
    return df.mapInPandas(
        run, schema=f"{schema}, url_norm string, domain string"
    )


def robots_filter(pages, robots, agent: str = "sparkbot"):
    """Drop pages a host's robots.txt disallows for ``agent``: ONE
    broadcast-able equi-join of pages (url column) to robots bodies
    (host, robots_txt), then an Arrow pass evaluating the matcher per
    row — matchers are parsed once per distinct body within each batch
    (robots bodies repeat massively across a host's pages). Pages from
    hosts with no robots row pass (the crawl convention)."""
    import pandas as pd
    import pyspark.sql.functions as F

    pages_keyed = pages.withColumn(
        "_host",
        F.lower(F.regexp_extract("url", r"^[a-zA-Z][a-zA-Z0-9+.-]*://([^/:?#]+)", 1)),
    )
    joined = pages_keyed.join(
        F.broadcast(robots.withColumnRenamed("host", "_host")),
        "_host",
        "left",
    )

    def run(batches):
        cache: dict[str, RobotsMatcher] = {}
        for pdf in batches:
            keep = []
            for url, body in zip(pdf["url"], pdf["robots_txt"]):
                if not isinstance(body, str) or not isinstance(url, str):
                    keep.append(True)
                    continue
                matcher = cache.get(body)
                if matcher is None:
                    matcher = cache[body] = RobotsMatcher(body)
                try:
                    parts = urlsplit(url)
                    path = parts.path or "/"
                    if parts.query:
                        path += "?" + parts.query
                except ValueError:
                    keep.append(False)
                    continue
                keep.append(matcher.allowed(agent, path))
            yield pdf[pd.Series(keep, index=pdf.index)]

    schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in joined.schema.fields
    )
    out_cols = [c for c in pages.columns]
    return joined.mapInPandas(run, schema=schema).select(*out_cols)
