"""Snapshot smoke gate — exactly what the driver does before anything else.

Round 1 was zeroed out by a missing import in a transitively-imported
module (VERDICT.md round 1): ``__spark_entry__`` failed at import, so the
driver saw zero queries and the whole round's correctness/bench signal
vanished. This test fails on any import-broken tree and asserts the
catalog/oracle contract the driver relies on.

Run standalone (fast, no Spark session needed for the import checks):
    python -m pytest tests/test_entry_smoke.py -q
"""

from __future__ import annotations

import importlib
import pkgutil
import subprocess
import sys

SF_SMALL = "/root/testdata/sf0.001"


def test_entry_imports_in_fresh_interpreter():
    """Import in a clean subprocess: the in-process import below could be
    masked by modules another test already loaded."""
    code = (
        "import __spark_entry__ as E; "
        "qs = E.queries(); osql = E.oracle_sql(); "
        "assert len(qs) >= 100, len(qs); "
        "assert set(osql) <= set(qs), sorted(set(osql) - set(qs))"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        cwd="/root/repo",
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]


def test_every_package_module_imports():
    """Walk every pyblazing_spark submodule — a NameError anywhere in the
    package is a snapshot-sinking bug even if no test touches the module."""
    import pyblazing_spark

    for mod in pkgutil.walk_packages(
        pyblazing_spark.__path__, prefix="pyblazing_spark."
    ):
        importlib.import_module(mod.name)


def test_entry_flagship_runs(spark):
    """entry(spark) must produce a DataFrame with a stable schema and >= 0
    rows on a plain session — the driver's smoke check."""
    import __spark_entry__ as E

    df = E.entry(spark)
    assert df.columns, "entry() returned a DataFrame with no columns"
    assert df.count() >= 0


def test_one_catalog_query_per_family_runs(spark):
    """Cheap end-to-end sanity over a representative slice of queries()
    (full sweep is scripts/driver_check.py): one TPC-H, one LLM op, one
    window, one streaming drain."""
    import __spark_entry__ as E

    qs = E.queries()
    for name in (
        "tpch_q6",
        "text_stats",
        "win_running_sum",
        "stream_window_counts",
        "dedup_components",
        "sink_partitioned_roundtrip",
        "multimodal_decode_ppm",
        "multimodal_resample_audio",
        "text_pii_redaction",
        "dedup_incremental",
    ):
        assert name in qs, f"{name} missing from catalog"
        out = qs[name](spark, SF_SMALL)
        assert out.count() >= 0, name


def test_driver_rotation_order():
    """Coverage rotation (plans/registry.py): queries() must lead with
    entries that have never had a green row in a committed
    CORRECTNESS_r*.json, round-robin across family prefixes, and list
    previously-covered entries afterwards, oldest round first."""
    from pyblazing_spark import plans
    from pyblazing_spark.plans.registry import _driver_coverage, rotation_order

    order = rotation_order()
    assert sorted(order) == sorted(plans.REGISTRY)  # a permutation
    covered = _driver_coverage()
    flags = [n in covered for n in order]
    # never-covered form a strict prefix (when any exist at all)
    if False in flags:
        first_covered = flags.index(True) if True in flags else len(flags)
        assert all(flags[first_covered:]), "covered entry interleaved before a never-covered one"
    # covered tail is ordered by last-covered round ascending
    tail_rounds = [covered[n] for n in order if n in covered]
    assert tail_rounds == sorted(tail_rounds)
    # queries()/oracle_sql() follow the same order
    qnames = list(plans.queries())
    assert qnames == order
    onames = [n for n in order if plans.REGISTRY[n].oracle]
    assert list(plans.oracle_sql()) == onames


def test_rotation_coverage_predicate():
    """A driver row only counts as coverage when FULLY green: a recorded
    hash/schema mismatch must re-enter the rotation head (round-5 verdict:
    expr_math's r02 hash-fail was wrongly treated as covered).  Absent or
    None hash/schema fields (rows-only no-oracle entries) still count."""
    from pyblazing_spark.plans.registry import _row_is_green

    green = {"rows_match": True, "schema_match": True, "hash_match": True, "err": None}
    assert _row_is_green(green)
    assert _row_is_green({"rows_match": True, "err": None})  # rows-only entry
    assert _row_is_green({**green, "hash_match": None, "schema_match": None})
    assert not _row_is_green({**green, "hash_match": False})  # the r02 expr_math shape
    assert not _row_is_green({**green, "schema_match": False})
    assert not _row_is_green({**green, "rows_match": False})
    assert not _row_is_green({**green, "err": "boom"})
    assert not _row_is_green(None)
    assert not _row_is_green("not-a-row")
