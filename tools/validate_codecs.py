"""External-validation sweep: decode every real media file findable on
this machine with the engine's zero-dep codecs and report coverage.

Foreign bitstreams (libjpeg, libpng, giflib, image editors) are the
strongest available check on from-scratch decoders — self-round-trips
cannot catch a consistently wrong constant table. This tool walks the
given roots (default: the container's doc/vendored-asset trees), runs
header AND pixel decode on every file with a known media suffix, and
prints per-format counts: header-parsed, pixel-decoded, refused
(honest subset limits, e.g. VP8 webp pixels), and crashed (must be 0 —
the NULL-on-malformed contract).

Usage: python tools/validate_codecs.py [root ...]
"""

from __future__ import annotations

import pathlib
import sys
from collections import Counter

sys.path.insert(0, ".")

from debgpt7_8_with_vectordb_spark.operators.multimodal import (
    decode_image_pixels,
    parse_image_header,
)

DEFAULT_ROOTS = [
    "/usr/share/doc",
    "/usr/share/gitweb",
    "/usr/lib/google-cloud-sdk",
    # CPython test suites ship the container's only real .webp (lossy
    # VP8X+VP8+ALPH; its VP8L-compressed alpha plane is decoded by
    # tests/test_webpl_codec.py as third-party VP8L validation)
    "/root/.pyenv/versions/3.13.0/lib",
]
SUFFIXES = (
    ".jpg", ".jpeg", ".png", ".gif", ".bmp", ".ico", ".tif", ".tiff",
    ".webp", ".pnm", ".pgm", ".ppm", ".svg",
)
MAX_BYTES = 32 << 20  # skip pathological sizes


def main() -> None:
    roots = sys.argv[1:] or DEFAULT_ROOTS
    header_ok: Counter = Counter()
    pixels_ok: Counter = Counter()
    refused: Counter = Counter()
    crashed = []
    total = 0
    for root in roots:
        base = pathlib.Path(root)
        if not base.exists():
            continue
        for path in base.rglob("*"):
            if path.suffix.lower() not in SUFFIXES or not path.is_file():
                continue
            if path.stat().st_size > MAX_BYTES:
                continue
            total += 1
            raw = path.read_bytes()
            try:
                hdr = parse_image_header(raw)
                px = decode_image_pixels(raw)
            except Exception as exc:  # contract violation
                crashed.append((str(path), repr(exc)))
                continue
            key = hdr[0] if hdr else f"unrecognized{path.suffix.lower()}"
            if hdr:
                header_ok[key] += 1
            if px:
                pixels_ok[px[0]] += 1
            elif hdr:
                refused[key] += 1
    print(f"scanned {total} media files under {roots}")
    for fmt in sorted(set(header_ok) | set(pixels_ok)):
        print(
            f"  {fmt:>14}: header={header_ok.get(fmt, 0):<5} "
            f"pixels={pixels_ok.get(fmt, 0):<5} "
            f"pixel-refused={refused.get(fmt, 0)}"
        )
    unrec = {k: v for k, v in header_ok.items() if k.startswith("unrec")}
    if unrec:
        print("  unrecognized:", dict(unrec))
    print(f"crashes: {len(crashed)}")
    for path, err in crashed[:10]:
        print("  CRASH", path, err)
    sys.exit(1 if crashed else 0)


if __name__ == "__main__":
    main()
