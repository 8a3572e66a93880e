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

import json
from collections.abc import Callable
from dataclasses import dataclass, field
from pathlib import Path

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


# ---------------------------------------------------------------------------
# Driver-coverage rotation.
#
# The per-round correctness driver samples the HEAD of the dict returned by
# ``queries()`` (a fixed 50-row budget).  Left in plain insertion order, four
# rounds of artifacts covered only the first ~69 unique entries and whole
# families (win_/join_/setop_/nested_/multimodal_/stream_) never earned a
# formal row.  ``queries()`` therefore emits the catalog ordered by "rounds
# since last formal driver row": entries with NO green row in any committed
# ``CORRECTNESS_r*.json`` come first — round-robin interleaved across family
# prefixes so a fixed budget maximizes family breadth — followed by covered
# entries, oldest round first.  The rotation is self-maintaining: each new
# committed artifact pushes its freshly-checked entries to the back.

#: Families the round-4 verdict called out as never-formally-checked; they
#: lead the interleave so a small budget touches each of them first.
_FAMILY_PRIORITY = ("win", "join", "setop", "nested", "multimodal", "stream")


def _row_is_green(row: object) -> bool:
    """True only for a FULLY green driver row.  ``schema_match`` /
    ``hash_match`` may be absent or ``None`` for rows-only (no-oracle)
    entries — only an explicit ``False`` (a recorded mismatch) disqualifies.
    A hash-fail row must re-enter the head of the rotation rather than
    queue behind never-checked entries (round-5 verdict: expr_math's stale
    r02 hash-fail counted as covered under the old rows-only predicate)."""
    return (
        isinstance(row, dict)
        and bool(row.get("rows_match"))
        and row.get("schema_match") is not False
        and row.get("hash_match") is not False
        and row.get("err") is None
    )


def _driver_coverage() -> dict[str, int]:
    """name -> latest round with a green driver row, from committed
    CORRECTNESS_r*.json artifacts at the repo root (file-relative so the
    driver's cwd does not matter)."""
    root = Path(__file__).resolve().parents[2]
    covered: dict[str, int] = {}
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            rnd = int(p.stem.rsplit("_r", 1)[1])
            data = json.loads(p.read_text())
        except (ValueError, IndexError, OSError, json.JSONDecodeError):
            continue
        if not isinstance(data, dict):
            continue
        for name, row in data.items():
            if _row_is_green(row):
                covered[name] = max(covered.get(name, -1), rnd)
    return covered


def rotation_order() -> list[str]:
    """Catalog names, never-driver-checked first (family-interleaved),
    then previously-checked entries oldest-round first.  Deterministic
    given the committed artifacts."""
    names = list(REGISTRY)
    covered = _driver_coverage()
    insertion = {n: i for i, n in enumerate(names)}

    fams: dict[str, list[str]] = {}
    for n in names:
        if n not in covered:
            fams.setdefault(n.split("_", 1)[0], []).append(n)
    fam_order = [f for f in _FAMILY_PRIORITY if f in fams]
    fam_order += [f for f in fams if f not in fam_order]
    queues = {f: list(fams[f]) for f in fam_order}
    never: list[str] = []
    while any(queues.values()):
        for f in fam_order:
            if queues[f]:
                never.append(queues[f].pop(0))

    old = sorted((n for n in names if n in covered), key=lambda n: (covered[n], insertion[n]))
    return never + old


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in rotation_order()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle for name in rotation_order() if REGISTRY[name].oracle
    }


def bench_queries() -> dict[str, QueryFn]:
    return {name: spec.fn for name, spec in REGISTRY.items() if spec.bench}
