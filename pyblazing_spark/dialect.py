"""SQL dialect shim: reference (Calcite, MySQL lex —
``RelationalAlgebraGenerator.java:127``) -> Spark SQL.

Probe results against Spark 4 (kept in ``tests/test_dialect.py``): the
reference corpus's constructs — ``SUBSTRING(x FROM a FOR b)``,
``TRIM(BOTH/LEADING/TRAILING .. FROM ..)``, ``TIMESTAMPADD/DIFF``,
interval literals, ``MOD``, ``LOG10``, ``CHAR_LENGTH``, ``INITCAP``,
Calcite DOW numbering (Sunday=1) — all parse and evaluate identically
in Spark SQL, so the shim leaves them alone.

Rewritten deltas (each surfaced by replaying the reference's own e2e
corpus, ``scripts/reference_replay.py``):

- datetime FORMAT STRINGS in ``TO_DATE`` / ``TO_TIMESTAMP`` (reference
  ``expression_utils.hpp:89-90``): the reference accepts
  Oracle/Calcite-style (``YYYY-MM-DD HH24:MI:SS``) and C-style
  (``%Y-%m-%d``) patterns, while Spark uses its own
  (``yyyy-MM-dd HH:mm:ss``). :func:`prepare` rewrites just those
  format literals, token-wise.
- bare ``CAST(x AS VARCHAR)`` / ``AS CHAR`` (no length): legal in
  Calcite (``castSuite/TEST_01``), rejected by Spark — rewritten to
  ``AS STRING``. Length-qualified forms already parse.
- slash-format date literals ``CAST('1997/05/02' AS DATE)``
  (``castSuite/TEST_15``): the reference's cuDF cast accepts them;
  Spark's ANSI date parse does not — rewritten to a DATE literal.
- interval-qualifier PRECISION ``INTERVAL '23:15' HOUR(2) TO MINUTE``
  (``intervalSuite/TEST_14-23``): Calcite accepts the SQL-standard
  leading-field precision; Spark's parser does not — the ``(n)`` is
  dropped (Spark validates the literal against the unit span anyway).

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

_TO_FN_NAME = re.compile(r"(?i)\b(TO_DATE|TO_TIMESTAMP)\s*\(")
#: POSIX backreference inside a single-quoted string literal that is an
#: argument of REGEXP_REPLACE: Calcite/cuDF replacement strings spell
#: group refs ``\1``; Spark's replacement syntax is Java's ``$1`` (and
#: Spark's string parser would strip the bare backslash anyway, turning
#: '\2--\1' into the literal '2--1'). Scoped to REGEXP_REPLACE calls so
#: backslashes in other literals are untouched.
_REGEXP_REPLACE_NAME = re.compile(r"(?i)\bREGEXP_REPLACE\s*\(")
_BACKREF = re.compile(r"\\(\d)")
_FMT_LIT = re.compile(r",\s*'([^']*)'\s*$")
#: Bare (length-free) VARCHAR/CHAR cast targets — Calcite-legal, Spark not.
_BARE_VARCHAR = re.compile(r"(?i)\bAS\s+(?:VARCHAR|CHAR)\s*(\))")
#: String literal in yyyy/MM/dd form cast to DATE.
_SLASH_DATE = re.compile(
    r"(?i)\bCAST\s*\(\s*'(\d{4})/(\d{2})/(\d{2})'\s+AS\s+DATE\s*\)"
)
#: SQL-standard interval leading-field precision, e.g. HOUR(2) TO MINUTE
#: or DAY(3) — Calcite-legal, Spark's interval parser rejects the parens.
_INTERVAL_PRECISION = re.compile(
    r"(?i)\b(INTERVAL\s+'[^']*'\s+(?:YEAR|MONTH|DAY|HOUR|MINUTE|SECOND))"
    r"\s*\(\d+\)"
)


def translate_format(fmt: str) -> str:
    """Oracle/Calcite/C-style datetime pattern -> Spark pattern."""
    if any(tok in fmt for tok, _ in _FMT_TOKENS):
        for tok, repl in _FMT_TOKENS:
            fmt = fmt.replace(tok, repl)
    return fmt


def _matching_paren(sql: str, open_idx: int) -> int:
    """Index of the ')' closing the '(' at open_idx; -1 if unbalanced.
    Skips parens inside single-quoted literals."""
    depth, i, n = 0, open_idx, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":  # skip string literal ('' is the escaped quote)
            i += 1
            while i < n:
                if sql[i] == "'":
                    if i + 1 < n and sql[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


def _split_top_level_commas(s: str) -> list[str]:
    """Split an argument list on commas at paren depth 0, skipping
    commas inside single-quoted literals ('' is the escaped quote)."""
    parts, start, depth, i, n = [], 0, 0, 0, len(s)
    while i < n:
        ch = s[i]
        if ch == "'":
            i += 1
            while i < n:
                if s[i] == "'":
                    if i + 1 < n and s[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            parts.append(s[start:i])
            start = i + 1
        i += 1
    parts.append(s[start:])
    return parts


def _quoted_spans(s: str) -> list[tuple[int, int]]:
    """[start, end) spans of single-quoted literals in ``s`` ('' escaped).
    Used to reject REGEXP_REPLACE name matches that are mere TEXT inside a
    string literal — treating those as nested calls would both corrupt the
    span arithmetic and leave later backrefs in the literal unrewritten."""
    spans, i, n = [], 0, len(s)
    while i < n:
        if s[i] == "'":
            start = i
            i += 1
            while i < n:
                if s[i] == "'":
                    if i + 1 < n and s[i + 1] == "'":
                        i += 2
                        continue
                    break
                i += 1
            spans.append((start, min(i + 1, n)))
        i += 1
    return spans


def _in_spans(idx: int, spans: list[tuple[int, int]]) -> bool:
    return any(a <= idx < b for a, b in spans)


def _rewrite_replacement_literals(s: str) -> str:
    """``\\1`` -> ``$1`` inside every single-quoted literal of ``s`` —
    only safe on text known to contain no nested REGEXP_REPLACE call."""
    return re.sub(
        r"'([^']*)'",
        lambda lm: "'" + _BACKREF.sub(r"$\1", lm.group(1)) + "'",
        s,
    )


def _rewrite_replacement_arg(a: str) -> str:
    """Rewrite backrefs in a REPLACEMENT argument: literals outside any
    nested REGEXP_REPLACE span get ``\\1`` -> ``$1``; each nested call
    span is recursed position-aware instead, so a nested call's own
    PATTERN literal (e.g. the back-match ``'(a)\\1'``) stays verbatim
    while its nested replacement arg is still rewritten."""
    out, pos = [], 0
    quoted = _quoted_spans(a)
    for m in _REGEXP_REPLACE_NAME.finditer(a):
        open_idx = m.end() - 1
        if open_idx < pos or _in_spans(m.start(), quoted):
            continue  # already consumed, or just text inside a literal
        close_idx = _matching_paren(a, open_idx)
        if close_idx < 0:
            continue
        out.append(_rewrite_replacement_literals(a[pos : m.start()]))
        out.append(_rewrite_regexp_backrefs(a[m.start() : close_idx + 1]))
        pos = close_idx + 1
    out.append(_rewrite_replacement_literals(a[pos:]))
    return "".join(out)


def _rewrite_regexp_backrefs(sql: str) -> str:
    """``\\1`` -> ``$1`` inside the string literals of the THIRD
    (replacement) argument of each REGEXP_REPLACE call (Calcite
    replacement syntax -> Spark/Java's).  The subject and pattern
    arguments are recursed into (for nested REGEXP_REPLACE) but their
    literals are left untouched: a pattern like ``'(a)\\1'`` is a
    back-match that must survive verbatim — the old rewrite-every-
    literal shortcut would have silently corrupted it to ``'(a)$1'``."""
    out, pos = [], 0
    quoted = _quoted_spans(sql)
    for m in _REGEXP_REPLACE_NAME.finditer(sql):
        open_idx = m.end() - 1
        if open_idx < pos or _in_spans(m.start(), quoted):
            continue
        close_idx = _matching_paren(sql, open_idx)
        if close_idx < 0:
            continue
        inner = sql[open_idx + 1 : close_idx]
        args = _split_top_level_commas(inner)
        if len(args) >= 3:
            # subject/pattern: recurse for nested calls, literals intact;
            # replacement (and any trailing flags arg): rewrite backrefs —
            # but only OUTSIDE any nested REGEXP_REPLACE span, which gets
            # its own position-aware recursion (its inner PATTERN literal
            # may hold a back-match '(a)\1' that must survive verbatim).
            head = [_rewrite_regexp_backrefs(a) for a in args[:2]]
            tail = [_rewrite_replacement_arg(a) for a in args[2:]]
            inner = ",".join(head + tail)
        out.append(sql[pos : open_idx + 1])
        out.append(inner)
        pos = close_idx
    out.append(sql[pos:])
    return "".join(out)


def prepare(sql: str) -> str:
    """Rewrite reference-dialect constructs to Spark SQL. Identity for
    queries that don't use them.

    A paren-matching scan (not a regex over the argument list) finds each
    TO_DATE/TO_TIMESTAMP call, so arbitrarily nested first arguments —
    COALESCE(NULLIF(..), ..) etc. — keep their format literal rewritten.
    """
    sql = _BARE_VARCHAR.sub(r"AS STRING\1", sql)
    sql = _SLASH_DATE.sub(r"DATE '\1-\2-\3'", sql)
    sql = _INTERVAL_PRECISION.sub(r"\1", sql)
    sql = _rewrite_regexp_backrefs(sql)
    out, pos = [], 0
    for m in _TO_FN_NAME.finditer(sql):
        open_idx = m.end() - 1
        if open_idx < pos:  # inside an already-rewritten span
            continue
        close_idx = _matching_paren(sql, open_idx)
        if close_idx < 0:
            continue
        inner = sql[open_idx + 1 : close_idx]
        lit = _FMT_LIT.search(inner)
        if lit:
            # recurse on the argument prefix so nested TO_DATE calls get
            # their formats rewritten too
            inner = prepare(inner[: lit.start()]) + f", '{translate_format(lit.group(1))}'"
        else:
            inner = prepare(inner)
        out.append(sql[pos : open_idx + 1])
        out.append(inner)
        pos = close_idx
    out.append(sql[pos:])
    return "".join(out)
