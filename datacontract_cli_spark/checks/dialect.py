"""Minimal SQL dialect shim: user quality queries → Spark SQL.

The reference transpiles custom-SQL quality rules through sqlglot
(datacontract/engines/ibis/ibis_check_execute.py:906-915, quality.dialect).
sqlglot is not available in this environment, so this module rewrites the
dialect constructs that actually appear in contracts (the reference's own
quality fixture is the acceptance case):

- ``percentile_cont(q) WITHIN GROUP (ORDER BY col [DESC])`` →
  ``percentile(col, q)`` (DESC → 1-q)
- ``EXTRACT(EPOCH FROM <expr>)`` → epoch seconds; for a timestamp
  difference ``A - B`` it becomes millisecond subtraction / 1000.0
  (Spark's ts - ts yields an INTERVAL that EXTRACT(EPOCH) can't consume)
- postgres ``x::type`` casts → ``CAST(x AS type)``
- ``now()`` → ``current_timestamp()``

Unknown constructs pass through untouched — Spark SQL errors surface as
check result "error", matching the reference's behavior for untranspilable
queries.
"""

from __future__ import annotations

import re
from typing import Optional


def _matched_paren(text: str, open_idx: int) -> int:
    """Index of the ')' matching the '(' at open_idx (-1 if unbalanced)."""
    depth = 0
    for i in range(open_idx, len(text)):
        if text[i] == "(":
            depth += 1
        elif text[i] == ")":
            depth -= 1
            if depth == 0:
                return i
    return -1


def _split_top_level_minus(expr: str) -> Optional[tuple]:
    depth = 0
    for i, ch in enumerate(expr):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "-" and depth == 0 and 0 < i < len(expr) - 1:
            return expr[:i].strip(), expr[i + 1:].strip()
    return None


def _rewrite_extract_epoch(query: str) -> str:
    pattern = re.compile(r"EXTRACT\s*\(\s*EPOCH\s+FROM", re.IGNORECASE)
    while True:
        m = pattern.search(query)
        if not m:
            return query
        open_idx = query.index("(", m.start())
        close = _matched_paren(query, open_idx)
        if close < 0:
            return query
        inner = query[m.end():close].strip()
        if inner.startswith("(") and _matched_paren(inner, 0) == len(inner) - 1:
            inner = inner[1:-1].strip()
        parts = _split_top_level_minus(inner)
        if parts:
            a, b = parts
            repl = (f"((unix_millis(CAST({a} AS TIMESTAMP)) - "
                    f"unix_millis(CAST({b} AS TIMESTAMP))) / 1000.0)")
        else:
            repl = f"(unix_millis(CAST({inner} AS TIMESTAMP)) / 1000.0)"
        query = query[:m.start()] + repl + query[close + 1:]


def _rewrite_percentile_cont(query: str) -> str:
    pattern = re.compile(
        r"percentile_cont\s*\(\s*([0-9.]+)\s*\)\s*WITHIN\s+GROUP\s*"
        r"\(\s*ORDER\s+BY\s+([A-Za-z_][\w.]*)\s*(ASC|DESC)?\s*\)",
        re.IGNORECASE,
    )

    def repl(m):
        q = float(m.group(1))
        col = m.group(2)
        if (m.group(3) or "").upper() == "DESC":
            q = 1.0 - q
        return f"percentile({col}, {q})"

    return pattern.sub(repl, query)


_PG_TYPE = (r"(?:double\s+precision|character\s+varying|"
            r"[A-Za-z_]\w*(?:\s*\(\s*[0-9]+(?:\s*,\s*[0-9]+)?\s*\))?)")


def _rewrite_pg_casts(query: str) -> str:
    return re.sub(rf"([A-Za-z_][\w.]*|\))\s*::\s*({_PG_TYPE})",
                  r"CAST(\1 AS \2)", query)


def to_spark_sql(query: str, dialect: Optional[str] = None) -> str:
    """Rewrite a user query for Spark. Applied regardless of the declared
    dialect (the rewrites are no-ops on already-Spark SQL)."""
    out = _rewrite_percentile_cont(query)
    out = _rewrite_extract_epoch(out)
    if (dialect or "").lower() in ("postgres", "postgresql", "redshift", "duckdb"):
        out = _rewrite_pg_casts(out)
    out = re.sub(r"\bnow\s*\(\s*\)", "current_timestamp()", out, flags=re.IGNORECASE)
    return out
