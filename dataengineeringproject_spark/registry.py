"""Query registry: every implemented operator from SURVEY.md §2 (and the
north-star extensions) exposed as a (spark_fn, oracle_sql) pair for the
driver's DuckDB differential harness.

Conventions (driver contract, __spark_entry__.py):
- spark_fn(spark, sf_dir) -> DataFrame; oracle SQL runs on DuckDB views
  named after the testdata tables.
- Column names are aliased IDENTICALLY on both sides (the driver sorts
  columns by name before hashing).
- Float aggregate outputs are rounded the same on both sides so
  summation-order differences between engines can't flip the value
  hash: ROUND(x, 6) for unit-scale values, ROUND(x, 2) for large sums.
- Integer aggregates are cast to BIGINT on both sides (DuckDB sum(int)
  is HUGEINT; Spark's is LONG).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLE: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optionally its oracle SQL)."""

    def deco(fn: QueryFn) -> QueryFn:
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLE[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    _load_all()
    return dict(_QUERIES)


def oracle_sql() -> dict[str, str]:
    _load_all()
    return dict(_ORACLE)


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    from dataengineeringproject_spark import queries as _q  # noqa: F401

    _q.load()
