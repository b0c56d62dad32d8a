"""Unified source dispatch (reference S21, reader.py:766-1032).

The reference routes a spec string by prefix (``file``/``dir``/``url``/
``cmd:``/``stdin``/...) to one of ~15 readers, each returning
``List[Entry]``. Here every source returns a **documents DataFrame**
``(path STRING, content STRING)`` — the §1.4 transient document model —
so downstream operators (chunker, embedder, mapreduce) compose uniformly.

Prefix routing is driver-side control flow (it picks WHICH DataFrame
source to declare); the data path itself stays distributed. Network-bound
sources (URL fan-out, reference S15/S16) are modeled as a spec-expansion
DataFrame feeding a fetch UDF — the fetch itself is stubbed here (no
network in this environment) behind ``fetcher=`` injection.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SourceFn = Callable[[SparkSession, str], DataFrame]

_SOURCES: dict[str, SourceFn] = {}


def register_source(prefix: str) -> Callable[[SourceFn], SourceFn]:
    def deco(fn: SourceFn) -> SourceFn:
        _SOURCES[prefix] = fn
        return fn

    return deco


def read(spark: SparkSession, spec: str) -> DataFrame:
    """Dispatch ``prefix:rest`` → registered source; bare specs are paths
    (file/dir/parquet/json decided by suffix), mirroring the reference's
    fallthrough order (reader.py:989-1032)."""
    if ":" in spec:
        prefix, rest = spec.split(":", 1)
        if prefix in _SOURCES:
            return _SOURCES[prefix](spark, rest)
    from . import debian, readers  # noqa: F401 — ensure built-ins registered

    if spec == "-":  # reference reader.py:1018: '-' is stdin
        return _SOURCES["stdin"](spark, "")
    if ":" in spec:
        prefix, rest = spec.split(":", 1)
        if prefix in _SOURCES:
            return _SOURCES[prefix](spark, rest)
    return _SOURCES["path"](spark, spec)
