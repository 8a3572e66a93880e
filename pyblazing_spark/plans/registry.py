"""Registry of named queries, mirroring the reference's E2E test corpus
(48 YAML suites / 671 queries under
``tests/BlazingSQLTest/EndToEndTests/TestSuites`` — SURVEY.md §5).

Each entry pairs a Spark DataFrame-API implementation with the equivalent
ANSI SQL that DuckDB runs as the oracle. Conventions (driver contract):

- every computed column is aliased IDENTICALLY on both sides;
- floating aggregates are rounded on both sides (money -> 2 dp,
  ratios/averages -> 4 dp) so partial-aggregation order cannot flip a hash;
- oracle SQL casts integer sums/extracts to the Spark result type
  (DuckDB sum(BIGINT) is HUGEINT, year() is BIGINT, ...);
- queries that are not SQL-expressible register ``oracle=None`` and get the
  driver's weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # included in bench.py's headline set


REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str,
    oracle: str | None = None,
    tags: tuple[str, ...] = (),
    bench: bool = False,
) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query to the catalog."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name: {name}")
        REGISTRY[name] = QuerySpec(name=name, fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.oracle for name, spec in REGISTRY.items() if spec.oracle}


def bench_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.bench}
