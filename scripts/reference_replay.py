"""Replay the reference's own e2e SQL corpus through BlazingContext.

The reference ships 48 YAML suites / 671 SQL queries
(``/root/reference/tests/BlazingSQLTest/EndToEndTests/TestSuites`` —
SURVEY.md §5); each suite compares engine output against Apache Drill
with a sorted-rows compare and a per-suite ACCEPTABLE_DIFFERENCE
tolerance. This harness does the same with DuckDB as the oracle:

1. parse every suite, pull each query's SQL verbatim;
2. keep the queries whose tables AND columns exist in our reduced
   TPC-H fixtures (FIXTURES.md: no partsupp, trimmed column sets —
   queries touching missing identifiers can't run on this testdata);
3. run each through ``BlazingContext.sql`` (the dialect shim included)
   and through DuckDB on the same parquet; compare sorted frames with
   the reference's 0.01 tolerance.

Usage: python scripts/reference_replay.py [sf_dir] [-v]
Exits nonzero if any runnable query mismatches. A query that neither
engine can parse (Calcite-only syntax) is counted "skipped:dialect" —
reported, not failed, mirroring how the reference itself skips suites
per engine capability (SKIP_WITH blocks).
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SUITE_DIR = "/root/reference/tests/BlazingSQLTest/EndToEndTests/TestSuites"

TABLES = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_name", "n_regionkey"),
    "customer": ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier": ("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part": ("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders": (
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ),
    "lineitem": (
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ),
}
AVAILABLE_COLS = frozenset(c for cols in TABLES.values() for c in cols)
#: TPC-H identifier shape: one-letter table prefix + underscore.
_IDENT = re.compile(r"\b([lcopsnr]+_[a-z0-9_]+)\b")
_FROM_TABLE = re.compile(r"\b(?:from|join)\s+([a-z_][a-z0-9_]*)", re.I)


def load_corpus() -> list[tuple[str, str, str]]:
    """(suite, test_name, sql) for every query in every suite."""
    import yaml

    out = []
    for fname in sorted(os.listdir(SUITE_DIR)):
        if not fname.endswith(".yaml"):
            continue
        with open(os.path.join(SUITE_DIR, fname)) as fh:
            try:
                doc = yaml.safe_load(fh)
            except yaml.YAMLError:
                continue
        suite = doc.get("TEST_SUITE", {}) if isinstance(doc, dict) else {}
        for key, val in suite.items():
            if key == "SETUP" or not isinstance(val, dict):
                continue
            sql = val.get("SQL")
            if isinstance(sql, str) and sql.strip():
                out.append((fname.removesuffix(".yaml"), key, sql.strip()))
    return out


def _split_top_args(s: str) -> list[str]:
    """Split an argument list on top-level commas (parens/quotes aware)."""
    parts, depth, cur, i, n = [], 0, [], 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            cur.append(ch)
            i += 1
            while i < n:
                cur.append(s[i])
                if s[i] == "'":
                    break
                i += 1
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    if cur:
        parts.append("".join(cur).strip())
    return parts


def _rewrite_calls(sql: str, fn_name: str, build) -> str:
    """Replace every ``fn_name(args...)`` with ``build(args_list)``.

    Emits rewritten text into an output buffer and resumes the scan
    after the original call site, so a replacement that still contains
    the function name (e.g. ``count(*)`` -> ``count(*)``) is never
    rescanned."""
    pat = re.compile(rf"(?i)\b{fn_name}\s*\(")
    out, pos = [], 0
    while True:
        m = pat.search(sql, pos)
        if not m:
            out.append(sql[pos:])
            return "".join(out)
        open_idx = m.end() - 1
        depth, i = 0, open_idx
        while i < len(sql):
            if sql[i] == "'":
                i += 1
                while i < len(sql) and sql[i] != "'":
                    i += 1
            elif sql[i] == "(":
                depth += 1
            elif sql[i] == ")":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        # inner args may contain nested calls of the same function:
        # rewrite them recursively (fresh scan over the argument text).
        args = [
            _rewrite_calls(a, fn_name, build)
            for a in _split_top_args(sql[open_idx + 1 : i])
        ]
        out.append(sql[pos : m.start()])
        out.append(build(args))
        pos = i + 1


def oracle_translate(sql: str) -> str:
    """Rewrite reference constructs DuckDB lacks into DuckDB SQL — applied
    to the ORACLE side only (BlazingContext gets the verbatim query).

    Covers: TIMESTAMPADD/TIMESTAMPDIFF (-> interval math / date_diff),
    Calcite TO_DATE/TO_TIMESTAMP with C-style formats (-> strptime), and
    Calcite's multi-argument COUNT / COUNT(DISTINCT ...) (counts rows
    where ALL arguments are non-null; verified to match Spark's
    semantics)."""
    sql = _rewrite_calls(
        sql, "TIMESTAMPADD",
        lambda a: f"(CAST({a[2]} AS TIMESTAMP) + ({a[1]}) * INTERVAL 1 {a[0]})",
    )
    _UNIT_SECONDS = {"SECOND": 1, "MINUTE": 60, "HOUR": 3600, "DAY": 86400}

    def _ts_diff(a: list[str]) -> str:
        # Calcite/Spark TIMESTAMPDIFF counts COMPLETE units (truncation
        # toward zero); DuckDB date_diff counts boundary crossings — off
        # by one for negative sub-unit remainders. Epoch math matches
        # the reference exactly for fixed-width units.
        secs = _UNIT_SECONDS.get(a[0].upper())
        if secs is None:  # calendar units: boundary counting is close enough
            return f"date_diff('{a[0]}', CAST({a[1]} AS TIMESTAMP), CAST({a[2]} AS TIMESTAMP))"
        return (
            f"CAST(trunc((epoch(CAST({a[2]} AS TIMESTAMP)) - "
            f"epoch(CAST({a[1]} AS TIMESTAMP))) / {secs}) AS BIGINT)"
        )

    sql = _rewrite_calls(sql, "TIMESTAMPDIFF", _ts_diff)
    sql = _rewrite_calls(
        sql, "TO_TIMESTAMP",
        lambda a: f"strptime({a[0]}, {a[1]})" if len(a) == 2 else f"TO_TIMESTAMP({', '.join(a)})",
    )
    sql = _rewrite_calls(
        sql, "TO_DATE",
        lambda a: (
            f"CAST(strptime({a[0]}, {a[1]}) AS DATE)" if len(a) == 2 else f"TO_DATE({', '.join(a)})"
        ),
    )

    def _multi_count(args: list[str]) -> str:
        distinct = args and re.match(r"(?i)^distinct\s+", args[0])
        if distinct:
            args = [re.sub(r"(?i)^distinct\s+", "", args[0]), *args[1:]]
            if len(args) == 1:
                return f"count(DISTINCT {args[0]})"
            guard = " AND ".join(f"{a} IS NOT NULL" for a in args)
            return f"count(DISTINCT CASE WHEN {guard} THEN ({', '.join(args)}) END)"
        if len(args) <= 1:
            return f"count({', '.join(args)})"
        guard = " AND ".join(f"{a} IS NOT NULL" for a in args)
        return f"count(CASE WHEN {guard} THEN 1 END)"

    sql = _rewrite_calls(sql, "COUNT", _multi_count)
    return sql


#: Queries where OUR result matches the reference's semantics but DuckDB
#: (the stand-in oracle) legitimately differs — documented engine-dialect
#: deltas, not parity failures:
#: - castSuite/TEST_10: double->int CAST rounds in DuckDB, truncates in
#:   Spark AND Calcite/cuDF (we match the reference).
#: - dayOfWeekSuite/*: DuckDB numbers Sunday=0; Spark and Calcite both
#:   number Sunday=1 (we match the reference; SURVEY.md §2.7).
#: - dateSuite/TEST_08: CURRENT_TIME/CURRENT_TIMESTAMP — wall-clock moves
#:   between the two engine invocations; inherently incomparable.
ORACLE_DIALECT_SKIP = {
    ("castSuite", "TEST_10"),
    ("dayOfWeekSuite", "TEST_01"),
    ("dayOfWeekSuite", "TEST_02"),
    ("dayOfWeekSuite", "TEST_03"),
    ("dateSuite", "TEST_08"),
}


def runnable(sql: str) -> bool:
    """True when every referenced table and TPC-H-shaped column exists
    in the reduced fixtures."""
    lowered = sql.lower()
    for tbl in _FROM_TABLE.findall(lowered):
        if tbl not in TABLES and tbl not in {"t", "t1", "t2"}:  # aliases
            return False
    for ident in _IDENT.findall(lowered):
        if ident not in AVAILABLE_COLS:
            return False
    return True


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    verbose = "-v" in sys.argv

    import duckdb
    import numpy as np
    import pandas as pd
    from pyspark.sql import SparkSession

    from pyblazing_spark.context import BlazingContext

    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    bc = BlazingContext(spark=spark)
    con = duckdb.connect()
    for tbl in TABLES:
        path = f"{sf_dir}/{tbl}.parquet"
        bc.create_table(tbl, path)
        con.execute(f"CREATE VIEW {tbl} AS SELECT * FROM '{path}'")

    corpus = load_corpus()
    candidates = [(s, t, q) for s, t, q in corpus if runnable(q)]
    print(f"corpus: {len(corpus)} queries, {len(candidates)} runnable on fixtures")

    n_ok = n_bad = n_dialect = n_oracle_skip = 0
    failures: list[str] = []
    for suite, test, sql in candidates:
        tag = f"{suite}/{test}"
        if (suite, test) in ORACLE_DIALECT_SKIP:
            n_oracle_skip += 1
            continue
        try:
            ours = bc.sql(sql, eager=True)
        except Exception as exc:
            # Spark couldn't parse/plan the Calcite-flavored SQL: dialect
            # gap on OUR side — only acceptable if DuckDB rejects it too
            # (i.e. it's nonstandard SQL, not a missing shim).
            try:
                con.execute(oracle_translate(sql)).df()
            except Exception:
                n_dialect += 1
                if verbose:
                    print(f"  SKIP dialect {tag}: {str(exc).splitlines()[0][:100]}")
                continue
            n_bad += 1
            failures.append(f"{tag}: spark-only parse failure: {str(exc).splitlines()[0][:160]}")
            continue
        try:
            theirs = con.execute(oracle_translate(sql)).df()
        except Exception as exc:
            n_dialect += 1
            if verbose:
                print(f"  SKIP duckdb {tag}: {str(exc).splitlines()[0][:100]}")
            continue
        try:
            _compare(ours, theirs, tolerance=0.01)
            n_ok += 1
            if verbose:
                print(f"  OK {tag} rows={len(ours)}")
        except Exception as exc:
            n_bad += 1
            failures.append(f"{tag}: {str(exc).splitlines()[0][:160]}")

    print(
        f"{n_ok} matched, {n_bad} mismatched, {n_dialect} skipped "
        f"(unparseable in both engines or DuckDB-rejected), "
        f"{n_oracle_skip} skipped (documented DuckDB-vs-reference dialect deltas)"
    )
    for f in failures:
        print("  FAIL", f)
    return 1 if n_bad else 0


def _compare(ours, theirs, tolerance: float) -> None:
    """Sorted-rows compare, positional columns (the reference's Drill
    compare is positional too: column NAMES differ across engines for
    unaliased aggregates, values must not)."""
    import numpy as np
    import pandas as pd

    assert ours.shape == theirs.shape, f"shape {ours.shape} vs {theirs.shape}"
    if ours.empty:
        return
    a = ours.copy()
    b = theirs.copy()
    a.columns = [f"c{i}" for i in range(a.shape[1])]
    b.columns = [f"c{i}" for i in range(b.shape[1])]
    for df in (a, b):
        for col in df.columns:
            if pd.api.types.is_datetime64_any_dtype(df[col]):
                if getattr(df[col].dtype, "tz", None) is not None:
                    df[col] = df[col].dt.tz_convert("UTC").dt.tz_localize(None)
                df[col] = df[col].astype("datetime64[us]")
            elif df[col].dtype == object:
                # Spark hands DECIMAL columns (e.g. bigint UNION decimal)
                # to pandas as objects — compare numerically when both
                # sides are numbers, not by string form.
                try:
                    df[col] = pd.to_numeric(df[col]).astype(float)
                except (ValueError, TypeError):
                    df[col] = df[col].astype(str)
    a = a.sort_values(list(a.columns), kind="mergesort").reset_index(drop=True)
    b = b.sort_values(list(b.columns), kind="mergesort").reset_index(drop=True)
    for col in a.columns:
        av, bv = a[col], b[col]
        if pd.api.types.is_numeric_dtype(av) and pd.api.types.is_numeric_dtype(bv):
            af = av.astype(float).to_numpy()
            bf = bv.astype(float).to_numpy()
            both_nan = np.isnan(af) & np.isnan(bf)
            close = np.isclose(af, bf, rtol=0, atol=tolerance, equal_nan=False)
            assert bool(np.all(both_nan | close)), f"col {col}: max diff {np.nanmax(np.abs(af - bf))}"
        else:
            assert av.astype(str).tolist() == bv.astype(str).tolist(), f"col {col} differs"


if __name__ == "__main__":
    raise SystemExit(main())
