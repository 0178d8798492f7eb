"""Query registry: the single source of truth for the engine's surface.

Every capability from SURVEY.md §2b is registered here as a named query
with (a) a Spark implementation ``fn(spark, sf_dir) -> DataFrame`` and
(b) an optional DuckDB oracle SQL string for exact cross-checking.
``__spark_entry__.py`` (the driver contract) is a thin view over this
registry.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None = None  # DuckDB SQL; None → rows-only check
    tags: tuple[str, ...] = ()
    bench: bool = False  # part of the headline bench set
    doc: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn`` as query ``name`` with its oracle SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        _REGISTRY[name] = QuerySpec(
            name=name, fn=fn, oracle=oracle, tags=tuple(tags), bench=bench,
            doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def _ensure_loaded() -> None:
    # Import side-effect populates the registry exactly once.
    import mapreduce_framework_spark.queries  # noqa: F401


def all_queries() -> dict[str, QuerySpec]:
    _ensure_loaded()
    return dict(_REGISTRY)


def get_query(name: str) -> QuerySpec:
    _ensure_loaded()
    return _REGISTRY[name]


def query_fns() -> dict[str, QueryFn]:
    """The driver's ``queries()`` payload."""
    return {name: spec.fn for name, spec in all_queries().items()}


def oracle_sqls() -> dict[str, str]:
    """The driver's ``oracle_sql()`` payload (hash-checked queries only)."""
    return {
        name: spec.oracle
        for name, spec in all_queries().items()
        if spec.oracle is not None
    }


def bench_queries() -> dict[str, QuerySpec]:
    return {n: s for n, s in all_queries().items() if s.bench}
