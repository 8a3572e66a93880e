"""Query catalog: every operator from SURVEY.md §2 as a named query with a
DuckDB oracle. Importing this package populates the registry."""

from pyblazing_spark.plans.registry import (
    REGISTRY,
    QuerySpec,
    bench_queries,
    oracle_sql,
    queries,
)

# Import for side effects: each module registers its queries.
from pyblazing_spark.plans import (  # noqa: E402,F401
    aggregates,
    curation,
    events,
    expressions,
    joins,
    llm,
    multimodal,
    nested,
    retrieval,
    sampling,
    setops,
    streaming,
    tpch,
    tpch_ps,
    vectors,
    windows,
)

#: Queries whose result may legitimately be empty at tiny scale factors.
ALLOWED_EMPTY: frozenset[str] = frozenset()

__all__ = ["REGISTRY", "QuerySpec", "queries", "oracle_sql", "bench_queries", "ALLOWED_EMPTY"]
