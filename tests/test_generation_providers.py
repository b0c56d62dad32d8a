"""Round-8 real generation providers (VERDICT r7 #2): request shape,
response parsing, registry integration, and the Spark Arrow path — all
offline via the picklable transport seam; the live call is env-gated
(same policy as test_providers.py)."""

from __future__ import annotations

import os

import pytest

from debgpt7_8_with_vectordb_spark.operators.providers import (
    _CLIENTS,
    OllamaGenerateClient,
    OpenAIChatClient,
    provider_generate_fn,
)


def test_openai_chat_request_shape():
    calls = []

    def fake_transport(url, body, headers):
        calls.append((url, body, headers))
        return {"choices": [{"message": {"content": "REPLY:" + body["messages"][0]["content"]}}]}

    c = OpenAIChatClient(
        "gpt-4o-mini", api_key="k", max_tokens=32, temperature=0.0,
        transport=fake_transport,
    )
    assert [c.generate(p) for p in ("hi", "yo")] == ["REPLY:hi", "REPLY:yo"]
    url, body, headers = calls[0]
    assert url.endswith("/chat/completions")
    assert body == {
        "model": "gpt-4o-mini",
        "messages": [{"role": "user", "content": "hi"}],
        "max_tokens": 32,
        "temperature": 0.0,
    }
    assert headers["Authorization"] == "Bearer k"


def test_openai_chat_missing_key_raises(monkeypatch):
    monkeypatch.delenv("OPENAI_API_KEY", raising=False)
    with pytest.raises(ValueError, match="api key"):
        OpenAIChatClient("m")


def test_ollama_request_shape_and_field_drift():
    calls = []
    responses = iter(
        [
            {"response": "modern"},
            {"output": "legacy-out"},
            {"result": "legacy-res"},
            {"weird": 1},
        ]
    )

    def fake_transport(url, body, headers):
        calls.append((url, body))
        return next(responses)

    c = OllamaGenerateClient("llama2", transport=fake_transport)
    assert c.generate("a") == "modern"
    assert c.generate("b") == "legacy-out"
    assert c.generate("c") == "legacy-res"
    assert c.generate("d") == '{"weird": 1}'  # raw JSON fallthrough
    url, body = calls[0]
    assert url.endswith("/api/generate")
    assert body == {
        "model": "llama2", "prompt": "a", "stream": False, "options": {},
    }


def test_provider_generate_fn_lazy_singleton(monkeypatch):
    _CLIENTS.clear()
    monkeypatch.setenv("OPENAI_API_KEY", "env-key")
    built = []
    orig_init = OpenAIChatClient.__init__

    def counting_init(self, *a, **kw):
        built.append(1)
        orig_init(self, *a, **kw)
        self.transport = lambda u, b, h: {
            "choices": [{"message": {"content": "ok"}}]
        }

    monkeypatch.setattr(OpenAIChatClient, "__init__", counting_init)
    fn = provider_generate_fn("openai", "m-lazy")
    assert not [k for k in _CLIENTS if k[0] == "gen"]
    assert fn(["a"]) == ["ok"]
    assert fn(["b", "c"]) == ["ok", "ok"]
    assert len(built) == 1  # one client for both calls
    _CLIENTS.clear()

    with pytest.raises(ValueError, match="unknown generation provider"):
        provider_generate_fn("nope", "m")


def test_registry_dispatches_real_provider_through_arrow(spark):
    """generate_with_backend over a provider backend runs the pandas-UDF
    path on executors: the transport is injected as a picklable closure
    (module-level fns in test files don't pickle — NOTES invariant).
    The key is passed as an opts kwarg here because a driver-side
    monkeypatched env does NOT reach the already-forked Python workers
    (in production the key is set in the executor environment before
    launch, which the lazy constructor reads)."""
    from debgpt7_8_with_vectordb_spark.operators.generation import (
        generate_with_backend,
        provider_backend,
        register_backend,
    )

    def fake_transport(url, body, headers):
        content = body["messages"][0]["content"]
        assert headers["Authorization"] == "Bearer spark-key"
        return {"choices": [{"message": {"content": content.upper()}}]}

    register_backend(
        "openai-test",
        provider_backend(
            "openai", "m-spark", transport=fake_transport, api_key="spark-key"
        ),
    )
    df = spark.createDataFrame(
        [(1, "hello"), (2, "world"), (3, None)], "id long, prompt string"
    )
    rows = {r["id"]: r["reply"] for r in
            generate_with_backend(df, "OPENAI-TEST").collect()}
    assert rows == {1: "HELLO", 2: "WORLD", 3: ""}


def test_default_provider_backends_registered():
    """The reference registers live backends unconditionally and fails
    at call time without the env (backends.py:121-139) — dispatch must
    resolve for openai/ollama without raising."""
    from debgpt7_8_with_vectordb_spark.operators.generation import backend

    assert backend("openai") is not None
    assert backend("OLLAMA") is not None


LIVE = os.environ.get("OPENAI_API_KEY")


@pytest.mark.skipif(not LIVE, reason="no OPENAI_API_KEY in environment")
def test_live_generation_roundtrip(spark):
    from debgpt7_8_with_vectordb_spark.operators.generation import (
        generate_with_backend,
    )

    df = spark.createDataFrame([(1, "Say the word ping and nothing else.")],
                               "id long, prompt string")
    reply = generate_with_backend(df, "openai").first()["reply"]
    assert isinstance(reply, str) and reply.strip()
