"""Real embedding-provider clients behind the ``provider_embed`` seam
(round 7; VERDICT r6 #6 — closes E1/E2's last gap).

The reference ships live OpenAI / Google embedding backends
(embeddings.py:155-258: batch ``embeddings.create`` /
``embed_content`` calls, L2-normalized, dimension-truncated). This
module provides the same two providers as thin stdlib-HTTP clients
shaped for Spark executors:

- **No SDK dependency**: both public REST surfaces are a single JSON
  POST; ``urllib.request`` covers it, and the ``transport`` seam makes
  the client fully unit-testable offline (CI injects a fake transport;
  the live path is env-gated and skipped without keys, the reference's
  own test policy — test_retrieval.py:30-36).
- **Per-executor singleton** (M5): ``provider_embed_fn`` returns a
  picklable closure holding only the config tuple; the HTTP client is
  built lazily on first call inside the executor and cached in a
  module-global, so N tasks share one client and keys are read from the
  executor's environment, never shipped through the closure.
- **Bounded retry stays upstream**: these clients raise on transport /
  HTTP errors and let ``provider_embed``'s bounded-backoff wrapper
  (operators/embedding.py) own the retry policy — one retry loop, not
  two nested ones (the reference's retry_ratelimit retries FOREVER;
  SURVEY flagged that as a hung-stage hazard in Spark tasks).

Normalization/truncation deliberately do NOT happen here: the engine's
insert invariant applies them JVM-side after the UDF (provider_embed),
so every backend — fake, OpenAI, Google — flows through the identical
contract and the E1 oracle stays one expression.
"""

from __future__ import annotations

import json
import os
import urllib.request


def retry_delay(
    exc: Exception, attempt: int, backoff_s: float, cap_s: float = 60.0,
    _now=None,
) -> float:
    """Backoff for one retry attempt: exponential in ``attempt``, raised
    to a server-provided ``Retry-After`` when the error carries one
    (HTTP 429/503 via urllib's HTTPError exposes response headers) in
    EITHER RFC 7231 form — delay-seconds or HTTP-date (IMF-fixdate,
    converted to a non-negative delta from now) — and capped so a
    hostile/buggy header can never park an executor slot for hours: the
    bounded-retry contract stays bounded in TIME as well as attempts.
    A malformed header falls back to the exponential delay. ``_now`` is
    the clock seam for tests (a tz-aware datetime)."""
    delay = backoff_s * (2**attempt)
    headers = getattr(exc, "headers", None)
    ra = headers.get("Retry-After") if hasattr(headers, "get") else None
    if ra:
        try:
            delay = max(delay, float(ra))
        except (TypeError, ValueError):
            from datetime import datetime, timezone
            from email.utils import parsedate_to_datetime

            try:
                when = parsedate_to_datetime(ra)
                if when.tzinfo is None:
                    when = when.replace(tzinfo=timezone.utc)
                now = _now or datetime.now(timezone.utc)
                delay = max(delay, (when - now).total_seconds())
            except (TypeError, ValueError):
                pass
    return min(max(delay, 0.0), cap_s)


def _http_post_json(url: str, body: dict, headers: dict) -> dict:
    """Minimal JSON POST; raises on non-2xx (urllib raises HTTPError)."""
    req = urllib.request.Request(
        url,
        data=json.dumps(body).encode("utf-8"),
        headers={"Content-Type": "application/json", **headers},
        method="POST",
    )
    with urllib.request.urlopen(req, timeout=60) as resp:
        return json.loads(resp.read().decode("utf-8"))


class OpenAIEmbeddingClient:
    """POST {base}/embeddings with {input, model, dimensions} → data[i].
    embedding (the public /v1/embeddings contract). ``transport`` is the
    test seam."""

    def __init__(
        self,
        model: str,
        dim: int,
        api_key: str | None = None,
        base_url: str | None = None,
        transport=None,
    ) -> None:
        self.model = model
        self.dim = dim
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "")
        self.base_url = (
            base_url
            or os.environ.get("OPENAI_BASE_URL", "https://api.openai.com/v1")
        ).rstrip("/")
        self.transport = transport or _http_post_json
        if not self.api_key:
            raise ValueError(
                "OpenAIEmbeddingClient needs an api key "
                "(OPENAI_API_KEY or api_key=)"
            )

    def batch_embed(self, texts: list[str]) -> list[list[float]]:
        resp = self.transport(
            f"{self.base_url}/embeddings",
            {"input": texts, "model": self.model, "dimensions": self.dim},
            {"Authorization": f"Bearer {self.api_key}"},
        )
        rows = sorted(resp["data"], key=lambda d: d["index"])
        if len(rows) != len(texts):
            raise ValueError(
                f"provider returned {len(rows)} embeddings for {len(texts)} inputs"
            )
        return [list(map(float, d["embedding"])) for d in rows]


class GoogleEmbeddingClient:
    """POST {base}/models/{model}:batchEmbedContents with one request
    per text → embeddings[i].values (the public Generative Language
    REST contract)."""

    def __init__(
        self,
        model: str,
        dim: int,
        api_key: str | None = None,
        base_url: str | None = None,
        transport=None,
    ) -> None:
        self.model = model
        self.dim = dim
        self.api_key = api_key or os.environ.get("GOOGLE_API_KEY", "")
        self.base_url = (
            base_url
            or os.environ.get(
                "GOOGLE_API_BASE_URL",
                "https://generativelanguage.googleapis.com/v1beta",
            )
        ).rstrip("/")
        self.transport = transport or _http_post_json
        if not self.api_key:
            raise ValueError(
                "GoogleEmbeddingClient needs an api key "
                "(GOOGLE_API_KEY or api_key=)"
            )

    def batch_embed(self, texts: list[str]) -> list[list[float]]:
        resp = self.transport(
            f"{self.base_url}/models/{self.model}:batchEmbedContents"
            f"?key={self.api_key}",
            {
                "requests": [
                    {
                        "model": f"models/{self.model}",
                        "content": {"parts": [{"text": t}]},
                        "outputDimensionality": self.dim,
                    }
                    for t in texts
                ]
            },
            {},
        )
        rows = resp["embeddings"]
        if len(rows) != len(texts):
            raise ValueError(
                f"provider returned {len(rows)} embeddings for {len(texts)} inputs"
            )
        return [list(map(float, e["values"])) for e in rows]


class OpenAIChatClient:
    """POST {base}/chat/completions with {model, messages, max_tokens,
    temperature} → choices[0].message.content — the OpenAI-compatible
    generation surface (reference backends.py:57-73; the same endpoint
    shape is served by vLLM / llama.cpp-server / Ollama's OpenAI
    compatibility layer, so ONE client covers the reference's openai +
    llamacpp + ollama rows wherever they speak this protocol).
    ``transport`` is the test seam."""

    def __init__(
        self,
        model: str,
        api_key: str | None = None,
        base_url: str | None = None,
        max_tokens: int = 256,
        temperature: float = 0.2,
        transport=None,
    ) -> None:
        self.model = model
        self.api_key = api_key or os.environ.get("OPENAI_API_KEY", "")
        self.base_url = (
            base_url
            or os.environ.get("OPENAI_BASE_URL", "https://api.openai.com/v1")
        ).rstrip("/")
        self.max_tokens = max_tokens
        self.temperature = temperature
        self.transport = transport or _http_post_json
        if not self.api_key:
            raise ValueError(
                "OpenAIChatClient needs an api key (OPENAI_API_KEY or api_key=)"
            )

    def generate(self, prompt: str) -> str:
        resp = self.transport(
            f"{self.base_url}/chat/completions",
            {
                "model": self.model,
                "messages": [{"role": "user", "content": prompt}],
                "max_tokens": self.max_tokens,
                "temperature": self.temperature,
            },
            {"Authorization": f"Bearer {self.api_key}"},
        )
        return resp["choices"][0]["message"]["content"]
    # NOTE: no batch method — the public contract is one conversation
    # per call; batch parallelism comes from Spark's row partitioning,
    # and the per-prompt retry loop lives in provider_generate_fn


class OllamaGenerateClient:
    """POST {base}/api/generate with {model, prompt, stream: false} →
    the reply text (reference backends.py:14-23; keyless local server,
    OLLAMA_URL env). Tolerates the field-name drift across server
    versions the reference handles: response/output/result, else the
    raw JSON."""

    def __init__(
        self,
        model: str,
        base_url: str | None = None,
        options: dict | None = None,
        transport=None,
    ) -> None:
        self.model = model
        self.base_url = (
            base_url or os.environ.get("OLLAMA_URL", "http://127.0.0.1:11434")
        ).rstrip("/")
        self.options = options or {}
        self.transport = transport or _http_post_json

    def generate(self, prompt: str) -> str:
        resp = self.transport(
            f"{self.base_url}/api/generate",
            {
                "model": self.model,
                "prompt": prompt,
                "stream": False,
                "options": self.options,
            },
            {},
        )
        out = resp.get("response") or resp.get("output") or resp.get("result")
        return out if out is not None else json.dumps(resp)


_PROVIDERS = {
    "openai": OpenAIEmbeddingClient,
    "google": GoogleEmbeddingClient,
}

_GEN_PROVIDERS = {
    "openai": OpenAIChatClient,
    "ollama": OllamaGenerateClient,
}

# per-executor client cache: one client per (provider, model, dim),
# shared by every task on the executor (M5 singleton hygiene)
_CLIENTS: dict[tuple, object] = {}


def provider_embed_fn(provider: str, model: str, dim: int):
    """Factory for the ``embed_fn`` slot of ``provider_embed``: returns
    a picklable closure over the CONFIG ONLY — the client (and its api
    key, read from the executor environment) materializes lazily on the
    first batch inside each executor and is cached module-globally.

    Usage::

        fn = provider_embed_fn("openai", "text-embedding-3-small", 256)
        vectors = provider_embed(docs, fn, dim=256)
    """
    if provider not in _PROVIDERS:
        raise ValueError(
            f"unknown provider {provider!r}; known: {sorted(_PROVIDERS)}"
        )
    cfg = (provider, model, dim)

    def embed(texts: list[str]) -> list[list[float]]:
        client = _CLIENTS.get(cfg)
        if client is None:
            client = _PROVIDERS[cfg[0]](model=cfg[1], dim=cfg[2])
            _CLIENTS[cfg] = client
        return client.batch_embed(texts)

    return embed


def provider_generate_fn(
    provider: str,
    model: str,
    transport=None,
    max_attempts: int = 5,
    backoff_s: float = 1.0,
    **opts,
):
    """Generation twin of ``provider_embed_fn``: returns a picklable
    ``list[str] -> list[str]`` closure over the config only; the HTTP
    client (and its key, read from the executor env) materializes
    lazily per executor and is cached. ``transport`` is the offline
    test seam — when injected it must itself be picklable (a closure),
    and it rides into the lazy constructor.

    M5 bounded retry at per-prompt granularity (the chat surface is one
    conversation per call): a 429 burst or malformed mid-batch response
    retries with exponential backoff up to ``max_attempts``, then
    raises to Spark's task-retry backstop — never the reference's
    infinite retry_ratelimit loop (embeddings.py:28-59), which would
    wedge an executor slot for the outage's duration. Completed prompts
    in a batch are not re-generated on a later prompt's retry.

    Usage::

        fn = provider_generate_fn("openai", "gpt-4o-mini")
        replies = generate_with_backend(df, "openai")   # registry path
    """
    if provider not in _GEN_PROVIDERS:
        raise ValueError(
            f"unknown generation provider {provider!r}; "
            f"known: {sorted(_GEN_PROVIDERS)}"
        )
    if max_attempts < 1:
        raise ValueError(f"max_attempts must be >= 1, got {max_attempts}")
    cfg = ("gen", provider, model, tuple(sorted(opts.items())))

    def generate(prompts: list[str]) -> list[str]:
        import time as _time

        client = _CLIENTS.get(cfg)
        if client is None:
            client = _GEN_PROVIDERS[cfg[1]](
                model=cfg[2], transport=transport, **dict(cfg[3])
            )
            _CLIENTS[cfg] = client
        out: list[str] = []
        for p in prompts:
            last: Exception | None = None
            for attempt in range(max_attempts):
                try:
                    out.append(client.generate(p))
                    break
                except Exception as exc:  # 429 / transport / bad shape
                    last = exc
                    if attempt < max_attempts - 1:
                        _time.sleep(retry_delay(exc, attempt, backoff_s))
            else:
                raise last  # type: ignore[misc]
        return out

    return generate
