"""Build a CLUSTERED embedding corpus — the manifold PQ is designed for.

The driver testdata's synthetic embeddings are near-uniform random: the
information-theoretic worst case for vector quantization, where the
honest PQ recall reading is ~0.2 (ann_pq_recall docstring). Real
embedding corpora are nothing like that — they concentrate on a
low-intrinsic-dimension manifold — so the PQ/IVFADC recall gate needs a
second corpus that models the favorable (realistic) regime: a seeded
mixture of Gaussians (default 50 clusters), unit-normalized, with
intra-cluster noise small enough that clusters are separable but large
enough that members get distinct codes.

tests/test_pq_clustered.py gates recall >= 0.8 here (vs ~0.2 on the
uniform corpus — both numbers recorded in SCALING.md); this tool writes
the same corpus at 10x for the SCALING.md measurement.

Usage: python tools/make_clustered_emb.py [out_dir] [n_vectors] [n_clusters]
"""

from __future__ import annotations

import os
import sys


def write_clustered_embeddings(
    out_dir: str,
    n_vectors: int = 5000,
    n_clusters: int = 50,
    dim: int = 64,
    sigma: float = 0.08,
    seed: int = 7,
) -> str:
    """Write ``out_dir``/embeddings.parquet: ``n_vectors`` unit-norm
    vectors drawn from a seeded ``n_clusters``-Gaussian mixture, schema
    identical to the driver testdata (vec_id int64, embedding
    list<float>, label int32 = the true cluster)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    cluster = np.arange(n_vectors) % n_clusters  # balanced assignment
    vecs = centers[cluster] + sigma * rng.normal(size=(n_vectors, dim))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)

    os.makedirs(out_dir, exist_ok=True)
    tbl = pa.table(
        {
            "vec_id": pa.array(range(n_vectors), type=pa.int64()),
            "embedding": pa.array(
                [v.astype(np.float32) for v in vecs], type=pa.list_(pa.float32())
            ),
            "label": pa.array(cluster.astype("int32"), type=pa.int32()),
        }
    )
    path = os.path.join(out_dir, "embeddings.parquet")
    pq.write_table(tbl, path)
    return path


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_clustered"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 5000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 50
    path = write_clustered_embeddings(out, n_vectors=n, n_clusters=k)
    print(f"{path}: {n} vectors, {k} clusters", flush=True)


if __name__ == "__main__":
    main()
