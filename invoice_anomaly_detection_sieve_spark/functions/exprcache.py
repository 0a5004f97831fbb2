"""Per-SparkContext cache of constructed Column-expression fragments.

Building a Column expression costs a py4j round-trip per function/operator
call; the validation DAG's expression trees were measured at ~10,500 py4j
commands ≈ 1.5 s of pure driver latency rebuilt on EVERY run (bench
samples, runner invocations, each scaling-level sample). Unresolved Column
objects are immutable and input-independent, so they are safe to reuse
across DataFrames within one SparkContext; keying on the context identity
drops them when the JVM goes away (a Column built on a stopped context
holds dead JVM references — same lifecycle rule as the pair-kernel UDF
cache in operators/pairs.py).

This caches EXPRESSIONS (unresolved query-plan fragments), never data,
results, or resolved plans — every run still computes from its inputs.
"""

from __future__ import annotations

from typing import Any, Callable

_CACHE: dict[tuple, Any] = {}


def cached_exprs(key: tuple, builder: Callable[[], Any]) -> Any:
    """Return ``builder()`` memoized per (active SparkContext, key).

    ``key`` must capture every input that changes the built expressions
    (thresholds, field tuples, model weights, ...); the builder must be
    pure expression construction.
    """
    from pyspark.sql import SparkSession

    sess = SparkSession.getActiveSession()
    ctx = id(sess.sparkContext) if sess is not None else None
    k = (ctx, *key)
    out = _CACHE.get(k)
    if out is None:
        if _CACHE and next(iter(_CACHE))[0] != ctx:
            _CACHE.clear()  # drop expressions bound to a stopped context
        out = builder()
        _CACHE[k] = out
    return out
