"""Round-7 real-provider embedding clients (VERDICT r6 #6): request
shape, response parsing, singleton hygiene, and composition with
provider_embed's bounded retry — all offline via the transport seam.
The live-network test is env-gated and skips without keys (the
reference's own policy, test_retrieval.py:30-36)."""

from __future__ import annotations

import os

import pytest

from debgpt7_8_with_vectordb_spark.operators.providers import (
    _CLIENTS,
    GoogleEmbeddingClient,
    OpenAIEmbeddingClient,
    provider_embed_fn,
)


def test_openai_request_shape_and_response_order():
    calls = []

    def fake_transport(url, body, headers):
        calls.append((url, body, headers))
        # provider may return rows out of order; index is authoritative
        return {
            "data": [
                {"index": 1, "embedding": [0.0, 1.0]},
                {"index": 0, "embedding": [1.0, 0.0]},
            ]
        }

    c = OpenAIEmbeddingClient(
        "text-embedding-3-small", 2, api_key="k", transport=fake_transport
    )
    got = c.batch_embed(["a", "b"])
    assert got == [[1.0, 0.0], [0.0, 1.0]]  # reordered by index
    url, body, headers = calls[0]
    assert url.endswith("/embeddings")
    assert body == {
        "input": ["a", "b"],
        "model": "text-embedding-3-small",
        "dimensions": 2,
    }
    assert headers["Authorization"] == "Bearer k"


def test_google_request_shape():
    calls = []

    def fake_transport(url, body, headers):
        calls.append((url, body))
        return {"embeddings": [{"values": [0.5, 0.5]} for _ in body["requests"]]}

    c = GoogleEmbeddingClient(
        "text-embedding-004", 2, api_key="gk", transport=fake_transport
    )
    got = c.batch_embed(["x", "y", "z"])
    assert len(got) == 3 and got[0] == [0.5, 0.5]
    url, body = calls[0]
    assert ":batchEmbedContents" in url and "key=gk" in url
    assert body["requests"][0]["content"]["parts"] == [{"text": "x"}]
    assert body["requests"][0]["outputDimensionality"] == 2


def test_count_mismatch_and_missing_key_raise(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(ValueError, match="api key"):
        OpenAIEmbeddingClient("m", 2)

    c = OpenAIEmbeddingClient(
        "m", 2, api_key="k",
        transport=lambda u, b, h: {"data": [{"index": 0, "embedding": [1.0]}]},
    )
    with pytest.raises(ValueError, match="1 embeddings for 2"):
        c.batch_embed(["a", "b"])


def test_provider_embed_fn_lazy_singleton(monkeypatch):
    """The closure ships config only; the client builds on first call
    (reading the key from the EXECUTOR env) and is reused."""
    _CLIENTS.clear()
    fn = provider_embed_fn("openai", "m-lazy", 4)
    assert not _CLIENTS  # nothing built at factory time

    monkeypatch.setenv("OPENAI_API_KEY", "env-key")
    built = []
    orig_init = OpenAIEmbeddingClient.__init__

    def counting_init(self, *a, **kw):
        built.append(1)
        orig_init(self, *a, **kw)
        self.transport = lambda u, b, h: {
            "data": [
                {"index": i, "embedding": [0.0] * 4}
                for i in range(len(b["input"]))
            ]
        }

    monkeypatch.setattr(OpenAIEmbeddingClient, "__init__", counting_init)
    assert fn(["a"]) == [[0.0] * 4]
    assert fn(["b", "c"]) == [[0.0] * 4] * 2
    assert len(built) == 1  # one client for both calls
    assert _CLIENTS[("openai", "m-lazy", 4)].api_key == "env-key"
    _CLIENTS.clear()

    with pytest.raises(ValueError, match="unknown provider"):
        provider_embed_fn("nope", "m", 2)


def test_transient_error_then_success_through_bounded_retry(spark, monkeypatch):
    """Composed with provider_embed: a transport that fails twice then
    succeeds is healed by the M5 bounded retry, and the output honors
    the engine's truncate+normalize insert invariant."""
    import debgpt7_8_with_vectordb_spark.operators.providers as P
    from debgpt7_8_with_vectordb_spark.operators.embedding import provider_embed

    state = {"fails": 2}

    def flaky(texts):
        if state["fails"] > 0:
            state["fails"] -= 1
            raise OSError("transient 429")
        return [[3.0, 4.0, 0.0, 0.0] for _ in texts]

    docs = spark.createDataFrame(
        [(1, "a"), (2, "b")], "doc_id long, content string"
    ).coalesce(1)
    out = provider_embed(docs, flaky, dim=2, backoff_s=0.0).collect()
    vecs = {r["doc_id"]: r["vector"] for r in out}
    assert [round(v, 6) for v in vecs[1]] == [0.6, 0.8]  # truncated to 2, L2=1


LIVE = os.environ.get("OPENAI_API_KEY") or os.environ.get("GOOGLE_API_KEY")


@pytest.mark.skipif(not LIVE, reason="no provider api key in environment")
def test_live_provider_roundtrip(spark):
    """Env-gated: runs only when a real key is present. Fakes remain the
    CI path."""
    from debgpt7_8_with_vectordb_spark.operators.embedding import provider_embed

    if os.environ.get("OPENAI_API_KEY"):
        fn = provider_embed_fn("openai", "text-embedding-3-small", 64)
    else:
        fn = provider_embed_fn("google", "text-embedding-004", 64)
    docs = spark.createDataFrame([(1, "hello world")], "doc_id long, content string")
    rows = provider_embed(docs, fn, dim=64).collect()
    assert len(rows) == 1 and len(rows[0]["vector"]) == 64
    norm = sum(v * v for v in rows[0]["vector"]) ** 0.5
    assert abs(norm - 1.0) < 1e-6
