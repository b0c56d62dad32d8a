"""Generation-backend registry (reference vector_service/backends.py:121-139).

The reference maps backend names (ollama/llamacpp/openai/google/hf) to
``generate(prompt, options) -> str`` HTTP calls and dispatches by name,
raising on unknown backends. The online serving hop is out of engine
scope (north star); what the ENGINE owns is the dispatch surface and
the batch shape: a backend is a *column transformation* applied to a
prompt column, so a backfill generates replies for N conversations in
one distributed pass.

Deterministic backends ship in-repo (the reference's own EchoFrontend
lossy fake, frontend.py:289-293, plus a reversing fake) — they keep the
registry, dispatch, and batch plumbing testable/oracle-able without
network. A real provider plugs in as an Arrow-batched ``mapInPandas``
stage (the ``provider_embed`` seam shape, operators/embedding.py) under
the same registry name.

Backends are Catalyst expressions where possible (JVM-side, codegen) —
a Python fake would push every prompt through Arrow for no reason.
"""

from __future__ import annotations

from collections.abc import Callable

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

#: name -> (prompt column -> reply column)
_BACKENDS: dict[str, Callable[[Column], Column]] = {}


def register_backend(name: str, fn: Callable[[Column], Column]) -> None:
    _BACKENDS[name.lower()] = fn


def backend(name: str) -> Callable[[Column], Column]:
    """Dispatch by name (reference backends.py:134-139 semantics:
    case-insensitive, ValueError on unknown)."""
    key = name.lower()
    if key not in _BACKENDS:
        raise ValueError(f"Unknown backend: {name} (have {sorted(_BACKENDS)})")
    return _BACKENDS[key]


def generate_with_backend(
    df: DataFrame, name: str, prompt_col: str = "prompt", out_col: str = "reply"
) -> DataFrame:
    """Batch generate: apply the named backend to every prompt row."""
    return df.withColumn(out_col, backend(name)(F.col(prompt_col)))


# every-2nd-char lossy echo — the reference's EchoFrontend fake
# (frontend.py:289-293): keeps char 1 of each pair
register_backend("echo", lambda c: F.regexp_replace(c, "(.).", r"$1"))

# full reversal — a second deterministic fake with a distinct output
# shape, proving the registry dispatches rather than hardcoding echo
register_backend("reverse", lambda c: F.reverse(c))
