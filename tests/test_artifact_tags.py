"""Handoff-artifact cache keys must embed their training parameters.

VERDICT r4 #5: the oracle-handoff artifacts (IVF centroids, PQ
codebooks, PCA mean/components, BPE merges) were keyed on (corpus
identity, fixed name) only — bumping _PCA_K or N_MERGES would silently
read a stale artifact trained under the old constant. These tests pin
the parameter-bearing tags and that a parameter change re-keys the
path.
"""

import pytest

from debgpt7_8_with_vectordb_spark.operators.ann import PQ_KSUB, PQ_SUBSPACES
from debgpt7_8_with_vectordb_spark.plans import catalog

# importing the plans package registers every tag
from debgpt7_8_with_vectordb_spark.plans.retrieval_queries import (
    _IVF_K,
    _IVF_SEED,
    _PCA_K,
    _PQ_SEED,
)
from debgpt7_8_with_vectordb_spark.plans.text_queries import N_MERGES

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize(
    "token,param",
    [
        ("__PCA_COMPONENTS__", lambda: f"k{_PCA_K}"),
        ("__BPE_MERGES__", lambda: f"m{N_MERGES}"),
        ("__IVF_CENTROIDS__", lambda: f"k{_IVF_K}s{_IVF_SEED}"),
        ("__PQ_CODEBOOKS__", lambda: f"m{PQ_SUBSPACES}k{PQ_KSUB}s{_PQ_SEED}"),
    ],
)
def test_tag_embeds_live_constant(token, param):
    tag = catalog.ORACLE_ARTIFACTS[token][1]
    assert tag.endswith(f"-{param()}"), (token, tag)


def test_qc_weight_tag_embeds_label_heuristic():
    """ADVICE r5 #3: the trained-classifier weight cache must re-key
    when the bootstrap LABEL heuristic (stop list / blend / threshold)
    changes, not only when the bucket count does — otherwise Spark
    reuses stale weights while the DuckDB oracle retrains inline."""
    import hashlib

    from debgpt7_8_with_vectordb_spark.plans.text_queries import (
        _QC_BUCKETS,
        _QC_HEUR,
        _STOP,
    )

    assert _QC_HEUR in f"qcw_b{_QC_BUCKETS}_h{_QC_HEUR}_v1"
    # the hash is derived from the live stopword set: editing _STOP
    # yields a different tag
    other = hashlib.md5(
        ("|".join(_STOP + ("zzz",)) + "|blend=100p+qm/200q|thr=500000|"
         "w=round(ln*1e6)").encode()
    ).hexdigest()[:8]
    assert other != _QC_HEUR


def test_param_bump_changes_cache_path():
    token = "__PCA_COMPONENTS__"
    old_entry = catalog.ORACLE_ARTIFACTS[token]
    old_path = catalog.oracle_artifact_path(token, SF_DIR)
    try:
        src, tag = old_entry
        bumped = tag.replace(f"k{_PCA_K}", f"k{_PCA_K + 1}")
        assert bumped != tag
        catalog.ORACLE_ARTIFACTS[token] = (src, bumped)
        assert catalog.oracle_artifact_path(token, SF_DIR) != old_path
    finally:
        catalog.ORACLE_ARTIFACTS[token] = old_entry


def test_tag_registration_is_idempotent():
    token = "__BPE_MERGES__"
    before = catalog.ORACLE_ARTIFACTS[token]
    catalog.tag_artifact(token, f"m{N_MERGES}")  # re-register, same params
    assert catalog.ORACLE_ARTIFACTS[token] == before
