"""Per-corpus derived-artifact cache keying — ONE definition of the
staleness rule every persisted artifact uses.

Derived tables that are deterministic functions of a corpus file
(minhash signatures, verified near-dup pairs, trained IVF centroids,
PQ codebooks) persist under /tmp keyed on the SOURCE FILE IDENTITY
(absolute path | mtime_ns | size | version tag): regenerated testdata
or edge corpora get fresh keys automatically, and bumping the version
tag invalidates every cache after a semantic change. In production
these artifacts live next to the corpus table and are written at
ingest; the identity key is the moral equivalent of the table's commit
id.

Known limitation, shared by design with every site: no cross-process
build lock — two concurrent first-builds race benignly (same
deterministic content; last writer wins a whole-directory or
atomic-replace write). Do not add per-site variations of this logic;
extend it here.
"""

from __future__ import annotations

import hashlib
import os


def corpus_cache_path(src_file: str, tag: str, root: str, ext: str = "") -> str:
    """Cache path keyed on (src_file identity, tag). ``ext`` appends a
    suffix for single-file artifacts (e.g. '.parquet' via pyarrow);
    directory artifacts (spark .write.parquet) leave it empty."""
    st = os.stat(src_file)
    key = hashlib.md5(
        f"{os.path.abspath(src_file)}|{st.st_mtime_ns}|{st.st_size}|{tag}".encode()
    ).hexdigest()[:16]
    return os.path.join(root, f"{key}{ext}")
