"""Query registry — the driver contract's source of truth.

Each implemented operator from SURVEY.md §2 registers a named
``(spark, sf_dir) -> DataFrame`` callable plus (when SQL-expressible) a
DuckDB oracle string with IDENTICAL output column names. ``__spark_entry__``
re-exports this registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class RegisteredQuery:
    name: str
    fn: QueryFn
    oracle: str | None  # None -> driver does rows-only check


_REGISTRY: dict[str, RegisteredQuery] = {}


def register(name: str, fn: QueryFn, oracle: str | None = None) -> None:
    if name in _REGISTRY:
        raise ValueError(f"duplicate query name: {name}")
    _REGISTRY[name] = RegisteredQuery(name, fn, oracle)


def query(name: str, oracle: str | None = None):
    """Decorator form of :func:`register`."""

    def deco(fn: QueryFn) -> QueryFn:
        register(name, fn, oracle)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from . import queries_reference  # noqa: F401
    from . import queries_tpch  # noqa: F401
    from . import queries_events  # noqa: F401
    from . import queries_text  # noqa: F401
    from . import queries_dedup  # noqa: F401
    from . import queries_similarity  # noqa: F401
    from . import queries_multimodal  # noqa: F401
    from . import queries_wafer  # noqa: F401


def all_queries() -> dict[str, QueryFn]:
    _load_all()
    return {n: r.fn for n, r in _REGISTRY.items()}


def all_oracles() -> dict[str, str]:
    _load_all()
    return {n: r.oracle for n, r in _REGISTRY.items() if r.oracle is not None}
