"""Rate-limit / malformed-response chaos drills for the real provider
clients under the M5 bounded retry (VERDICT r8 #6).

The reference retries rate limits FOREVER with a fixed sleep
(embeddings.py:28-59) — inside a Spark task that turns a provider
outage into a wedged executor slot. These drills inject a transport
that emits 429 bursts and malformed JSON mid-batch and assert the three
properties that replace the infinite loop: the retry is BOUNDED (call
counts pinned via a per-call log file), the healed output is
IDENTICAL to the no-fault output (idempotent batches), and exhaustion
fails the action fast while leaving the session usable (no wedge).

All offline via the transport seam; the log file gives the driver a
cross-process view of executor-side transport calls. Helpers live
inside the fixture so cloudpickle ships them BY VALUE — a module-level
helper would pickle as a reference to this (worker-unimportable) test
module.
"""

from __future__ import annotations

import time
from types import SimpleNamespace

import pytest

from debgpt7_8_with_vectordb_spark.operators.embedding import provider_embed
from debgpt7_8_with_vectordb_spark.operators.providers import (
    OpenAIEmbeddingClient,
)


@pytest.fixture()
def kit(tmp_path):
    log = str(tmp_path / "calls.log")

    def count_call():
        with open(log, "a") as fh:
            fh.write("x\n")
        with open(log) as fh:
            return sum(1 for _ in fh)

    def http_429(url):
        import urllib.error

        return urllib.error.HTTPError(url, 429, "Too Many Requests", {}, None)

    def ok_embeddings(body):
        return {
            "data": [
                {"index": i, "embedding": [float(len(t)), 1.0, 9.0, 9.0]}
                for i, t in enumerate(body["input"])
            ]
        }

    def calls():
        try:
            with open(log) as fh:
                return sum(1 for _ in fh)
        except OSError:
            return 0

    return SimpleNamespace(
        log=log,
        count_call=count_call,
        http_429=http_429,
        ok_embeddings=ok_embeddings,
        calls=calls,
    )


def test_429_bursts_heal_within_pinned_call_budget(spark, kit):
    """Every batch hits a 2-call 429 burst before succeeding; with
    max_attempts=5 all batches heal, and the transport log pins the
    exact bounded call count — 3 per batch, not unbounded."""

    def bursty(url, body, headers):
        n = kit.count_call()
        if n % 3 != 0:  # calls 1,2 fail; call 3 succeeds; repeat
            raise kit.http_429(url)
        return kit.ok_embeddings(body)

    client = OpenAIEmbeddingClient("m", dim=2, api_key="k", transport=bursty)
    docs = spark.createDataFrame(
        [(i, f"t{'x' * i}") for i in range(8)], "doc_id long, content string"
    ).coalesce(1)
    rows = provider_embed(
        docs, client.batch_embed, dim=2, batch_size=2, backoff_s=0.0
    ).collect()
    assert len(rows) == 8
    for r in rows:
        norm = sum(v * v for v in r["vector"]) ** 0.5
        assert abs(norm - 1.0) < 1e-6
    # 4 batches x (2 failures + 1 success) exactly
    assert kit.calls() == 12


def test_malformed_json_mid_batch_retries_and_output_is_idempotent(
    spark, kit
):
    """Per batch: a 429, then a structurally-valid-JSON but WRONG
    response (count mismatch — the malformed-mid-batch class), then a
    good response. The healed output must be identical to a no-fault
    run of the same rows (idempotent batches: a retried batch re-embeds
    from its input rows, never from partial state)."""

    def chaotic(url, body, headers):
        n = kit.count_call()
        phase = (n - 1) % 3
        if phase == 0:
            raise kit.http_429(url)
        if phase == 1:  # parses fine, wrong cardinality
            return {"data": [{"index": 0, "embedding": [1.0, 0.0]}]}
        return kit.ok_embeddings(body)

    docs = spark.createDataFrame(
        [(i, f"doc-{i % 3}") for i in range(6)],  # duplicate texts
        "doc_id long, content string",
    ).coalesce(1)
    chaos_client = OpenAIEmbeddingClient(
        "m", dim=2, api_key="k", transport=chaotic
    )
    healed = provider_embed(
        docs, chaos_client.batch_embed, dim=2, batch_size=3, backoff_s=0.0
    ).collect()

    def clean_transport(url, body, headers):
        return kit.ok_embeddings(body)

    clean_client = OpenAIEmbeddingClient(
        "m", dim=2, api_key="k", transport=clean_transport
    )
    clean = provider_embed(
        docs, clean_client.batch_embed, dim=2, batch_size=3, backoff_s=0.0
    ).collect()
    assert sorted(map(tuple, healed)) == sorted(map(tuple, clean))
    # duplicate texts embed identically (pure function of the input)
    by_text = {}
    for r in healed:
        by_text.setdefault(r["content"], set()).add(tuple(r["vector"]))
    assert all(len(vs) == 1 for vs in by_text.values())
    assert kit.calls() == 6  # 2 chaotic batches x exactly 3 calls


def test_retry_exhaustion_fails_fast_and_session_survives(spark, kit):
    """A permanent 429: the action must fail within the attempt bound
    (never the reference's infinite loop) and the session must stay
    fully usable afterwards — the no-executor-wedge property."""

    def always_429(url, body, headers):
        kit.count_call()
        raise kit.http_429(url)

    client = OpenAIEmbeddingClient(
        "m", dim=2, api_key="k", transport=always_429
    )
    docs = spark.createDataFrame(
        [(1, "a")], "doc_id long, content string"
    ).coalesce(1)
    t0 = time.time()
    with pytest.raises(Exception):
        provider_embed(
            docs, client.batch_embed, dim=2, max_attempts=3, backoff_s=0.0
        ).collect()
    assert time.time() - t0 < 60  # fails fast, no hung stage
    # 3 attempts per task attempt; local task-retry backstop is small
    assert kit.calls() % 3 == 0 and 3 <= kit.calls() <= 12
    # the executor pool is not wedged
    assert spark.range(100).count() == 100


def test_generation_provider_429_and_drift_bounded_retry(spark, kit):
    """provider_backend under the same chaos: per-prompt 429 bursts and
    a malformed (choices-missing) response heal within the bound;
    already-completed prompts in the batch are NOT re-generated when a
    later prompt retries (9 calls for 3 prompts, not more)."""
    import pyspark.sql.functions as F

    from debgpt7_8_with_vectordb_spark.operators.generation import (
        provider_backend,
    )

    def chaotic(url, body, headers):
        n = kit.count_call()
        prompt = body["messages"][0]["content"]
        if n % 3 == 1:
            raise kit.http_429(url)
        if n % 3 == 2:
            return {"unexpected": "shape"}  # KeyError in the client
        return {"choices": [{"message": {"content": f"re:{prompt}"}}]}

    # model name unique per test: _CLIENTS keys on config, not transport
    backend = provider_backend(
        "openai", model="m-chaos", transport=chaotic, api_key="k",
        backoff_s=0.0,
    )
    df = spark.createDataFrame(
        [(1, "alpha"), (2, "beta"), (3, "gamma")], "id long, prompt string"
    ).coalesce(1)
    rows = df.select(
        "prompt", backend(F.col("prompt")).alias("reply")
    ).collect()
    assert {r["prompt"]: r["reply"] for r in rows} == {
        "alpha": "re:alpha", "beta": "re:beta", "gamma": "re:gamma"
    }
    assert kit.calls() == 9  # 3 prompts x exactly 3 calls


def test_generation_exhaustion_raises_not_loops(spark, kit):
    """Generation-path exhaustion: bounded attempts then a raise — and
    the session survives."""
    import pyspark.sql.functions as F

    from debgpt7_8_with_vectordb_spark.operators.generation import (
        provider_backend,
    )

    def always_429(url, body, headers):
        kit.count_call()
        raise kit.http_429(url)

    backend = provider_backend(
        "openai",
        model="m-perm429",
        transport=always_429,
        api_key="k",
        max_attempts=2,
        backoff_s=0.0,
    )
    df = spark.createDataFrame([(1, "p")], "id long, prompt string").coalesce(1)
    with pytest.raises(Exception):
        df.select(backend(F.col("prompt")).alias("r")).collect()
    assert kit.calls() % 2 == 0 and 2 <= kit.calls() <= 8
    assert spark.range(10).count() == 10


def test_retry_delay_honors_retry_after_capped():
    """retry_delay: exponential by default, raised to a server
    Retry-After (seconds form), capped at 60 s even against a hostile
    header, HTTP-date forms fall back to exponential."""
    import urllib.error

    from debgpt7_8_with_vectordb_spark.operators.providers import retry_delay

    def err(headers):
        import email.message

        msg = email.message.Message()
        for k, v in headers.items():
            msg[k] = v
        return urllib.error.HTTPError("http://x", 429, "rl", msg, None)

    # plain exponential when no header
    assert retry_delay(OSError("boom"), 0, 1.0) == 1.0
    assert retry_delay(OSError("boom"), 3, 1.0) == 8.0
    # Retry-After raises the delay
    assert retry_delay(err({"Retry-After": "5"}), 0, 1.0) == 5.0
    # exponential wins when larger
    assert retry_delay(err({"Retry-After": "2"}), 3, 1.0) == 8.0
    # hostile header capped
    assert retry_delay(err({"Retry-After": "86400"}), 0, 1.0) == 60.0
    # HTTP-date form in the PAST: non-negative delta loses to exponential
    assert retry_delay(
        err({"Retry-After": "Fri, 31 Dec 1999 23:59:59 GMT"}), 1, 1.0
    ) == 2.0
    # HTTP-date form in the FUTURE: honored as a delta from now
    from datetime import datetime, timezone

    now = datetime(2026, 8, 15, 12, 0, 0, tzinfo=timezone.utc)
    assert retry_delay(
        err({"Retry-After": "Sat, 15 Aug 2026 12:00:10 GMT"}), 0, 1.0,
        _now=now,
    ) == 10.0
    # ... but still capped against a far-future hostile date
    assert retry_delay(
        err({"Retry-After": "Sun, 15 Aug 2027 12:00:00 GMT"}), 0, 1.0,
        _now=now,
    ) == 60.0
    # malformed date: exponential fallback
    assert retry_delay(err({"Retry-After": "not-a-date"}), 2, 1.0) == 4.0
    # cap also bounds the exponential itself
    assert retry_delay(OSError("boom"), 10, 1.0) == 60.0


def test_retry_after_header_parses_through_spark_path(spark, kit):
    """End-to-end: a 429 carrying a real Retry-After header heals inside
    the executor (the header parse path runs worker-side, where a typo'd
    attribute access would otherwise only surface in production)."""

    def bursty(url, body, headers):
        import email.message
        import urllib.error

        n = kit.count_call()
        if n % 2 == 1:
            msg = email.message.Message()
            # HTTP-date form (RFC 7231's second shape): a past date
            # parses worker-side to a non-negative bounded wait of 0
            msg["Retry-After"] = "Mon, 01 Jan 2024 00:00:00 GMT"
            raise urllib.error.HTTPError(url, 429, "rl", msg, None)
        return kit.ok_embeddings(body)

    client = OpenAIEmbeddingClient("m", dim=2, api_key="k", transport=bursty)
    docs = spark.createDataFrame(
        [(1, "a"), (2, "bb")], "doc_id long, content string"
    ).coalesce(1)
    rows = provider_embed(
        docs, client.batch_embed, dim=2, backoff_s=0.0
    ).collect()
    assert len(rows) == 2
    assert kit.calls() == 2  # one 429 + one success (single batch)
