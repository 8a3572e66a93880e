"""SQL dialect shim: reference (Calcite, MySQL lex —
``RelationalAlgebraGenerator.java:127``) -> Spark SQL.

Probe results against Spark 4 (kept in ``tests/test_dialect.py``): the
reference corpus's constructs — ``SUBSTRING(x FROM a FOR b)``,
``TRIM(BOTH/LEADING/TRAILING .. FROM ..)``, ``TIMESTAMPADD/DIFF``,
interval literals, ``MOD``, ``LOG10``, ``CHAR_LENGTH``, ``INITCAP``,
``VARCHAR`` casts, Calcite DOW numbering (Sunday=1) — all parse and
evaluate identically in Spark SQL, so the shim leaves them alone.

The one real delta is datetime FORMAT STRINGS in ``TO_DATE`` /
``TO_TIMESTAMP`` (reference ``expression_utils.hpp:89-90``): the
reference accepts Oracle/Calcite-style (``YYYY-MM-DD HH24:MI:SS``) and
C-style (``%Y-%m-%d``) patterns, while Spark uses its own
(``yyyy-MM-dd HH:mm:ss``). :func:`prepare` rewrites just those format
literals, token-wise, and is the identity for every other query.

Known semantic difference, deliberately NOT shimmed: integer ``/``.
Calcite truncates (7/2=3); Spark and DuckDB both return 3.5 — we follow
Spark/DuckDB (the correctness oracle), and `7 DIV 2` is available for
truncating division.
"""

from __future__ import annotations

import re

#: Ordered token rewrites (longest first so e.g. HH24 wins over HH).
_FMT_TOKENS: tuple[tuple[str, str], ...] = (
    ("YYYY", "yyyy"),
    ("HH24", "HH"),
    ("HH12", "hh"),
    ("YY", "yy"),
    ("DD", "dd"),
    ("MI", "mm"),
    ("SS", "ss"),
    ("%Y", "yyyy"),
    ("%m", "MM"),
    ("%d", "dd"),
    ("%H", "HH"),
    ("%M", "mm"),
    ("%S", "ss"),
)

_TO_FN = re.compile(
    r"(?i)\b(TO_DATE|TO_TIMESTAMP)\s*\(([^,()]+|[^,]*\([^)]*\)[^,]*),\s*'([^']*)'\s*\)"
)


def translate_format(fmt: str) -> str:
    """Oracle/Calcite/C-style datetime pattern -> Spark pattern."""
    if any(tok in fmt for tok, _ in _FMT_TOKENS):
        for tok, repl in _FMT_TOKENS:
            fmt = fmt.replace(tok, repl)
    return fmt


def prepare(sql: str) -> str:
    """Rewrite reference-dialect constructs to Spark SQL. Identity for
    queries that don't use them."""

    def _rw(m: re.Match) -> str:
        return f"{m.group(1)}({m.group(2)}, '{translate_format(m.group(3))}')"

    return _TO_FN.sub(_rw, sql)
