"""Scale tile for the crawl-curation pipeline: N vs 10N WARC shards.

Synthesizes per-shard WARC files executor-independently (driver writes
the files — they're the input medium), runs ``curate_crawl`` end to
end at both scales and reports wall growth. The pipeline's only
shuffles are the two dedup rank cuts; shards carry a mix of unique
pages, URL-spelling duplicates and cross-host mirrors so both dedup
stages do real work.

Usage: python tools/scale_crawl.py [n_shards] [pages_per_shard]
(defaults 4 and 120).
"""

from __future__ import annotations

import gzip
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, ".")

from debgpt7_8_with_vectordb_spark.operators.crawl import curate_crawl
from debgpt7_8_with_vectordb_spark.session import get_spark
from debgpt7_8_with_vectordb_spark.sources.readers import read_warc


def _page(seed: int) -> bytes:
    body = " ".join(
        f"Sentence {i} with deterministic payload {seed * 31 + i}."
        for i in range(24)
    )
    return (
        "<html><body><nav><a href='/'>Home</a><a href='/n'>News</a></nav>"
        f"<main><h1>Doc {seed}</h1><p>{body}</p></main>"
        "<footer><a href='/tos'>Terms</a> (c) corp</footer></body></html>"
    ).encode()


def _resp(uri: str, date: str, doc: bytes) -> bytes:
    http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n" + doc
    head = (
        "WARC/1.0\r\nWARC-Type: response\r\n"
        f"WARC-Target-URI: {uri}\r\nWARC-Date: {date}\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    )
    return head.encode() + http + b"\r\n\r\n"


def make_shards(root: Path, n_shards: int, pages: int) -> None:
    for s in range(n_shards):
        recs = []
        for p in range(pages):
            seed = s * pages + p
            date = f"2024-01-{(seed % 27) + 1:02d}T00:00:00Z"
            recs.append(_resp(f"http://h{seed % 50}.org/doc/{seed}", date, _page(seed)))
            if p % 3 == 0:  # URL-spelling duplicate
                recs.append(
                    _resp(
                        f"HTTP://H{seed % 50}.org:80/doc/../doc/{seed}",
                        date,
                        _page(seed),
                    )
                )
            if p % 5 == 0:  # cross-host mirror
                recs.append(
                    _resp(f"http://mirror.net/m/{seed}", date, _page(seed))
                )
        (root / f"shard-{s:05d}.warc.gz").write_bytes(
            gzip.compress(b"".join(recs))
        )


def run(spark, root: Path) -> tuple[float, int]:
    t0 = time.monotonic()
    n = curate_crawl(read_warc(spark, str(root / "*.warc.gz"))).count()
    return time.monotonic() - t0, n


def main() -> None:
    n_shards = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    pages = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    spark = get_spark(shuffle_partitions=32)
    for scale, mult in (("1x", 1), ("10x", 10)):
        root = Path(tempfile.mkdtemp(prefix=f"crawl_{scale}_"))
        make_shards(root, n_shards * mult, pages)
        secs, docs = run(spark, root)
        uniq = n_shards * mult * pages
        print(
            f"{scale:>3}: shards={n_shards * mult} pages~{uniq * 8 // 5} "
            f"curated={docs} (expect {uniq}) wall={secs:.2f}s"
        )


if __name__ == "__main__":
    main()
