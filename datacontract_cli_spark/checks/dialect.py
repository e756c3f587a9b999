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


def _mask_literals(query: str):
    """(masked, literals): every '...' string literal (with '' escapes)
    becomes a \x00L<n>\x00 placeholder so NO rewrite ever fires inside a
    quoted value — regexes and paren/comma/minus scanners alike were
    blind to literals, splitting '2024-06-01' at its hyphens and
    rewriting now()/LEN( inside compared strings."""
    lits, out, i, n = [], [], 0, len(query)
    while i < n:
        if query[i] == "'":
            j = i + 1
            while j < n:
                if query[j] == "'":
                    if j + 1 < n and query[j + 1] == "'":
                        j += 2
                        continue
                    break
                j += 1
            end = min(j + 1, n)
            out.append(f"\x00L{len(lits)}\x00")
            lits.append(query[i:end])
            i = end
        else:
            out.append(query[i])
            i += 1
    return "".join(out), lits


def _unmask_literals(text: str, lits) -> str:
    for k, lit in enumerate(lits):
        text = text.replace(f"\x00L{k}\x00", lit)
    return text


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
    """x::type — including ')::type' where the expression is a whole
    parenthesized group or function call: the old regex captured ONLY the
    closing paren, mangling sum(x)::int into sum(xCAST() AS int)."""
    pattern = re.compile(rf"::\s*({_PG_TYPE})")
    while True:
        m = pattern.search(query)
        if not m:
            return query
        k = m.start() - 1
        while k >= 0 and query[k].isspace():
            k -= 1
        if k < 0:
            return query
        if query[k] == ")":
            depth, j = 0, k
            while j >= 0:
                if query[j] == ")":
                    depth += 1
                elif query[j] == "(":
                    depth -= 1
                    if depth == 0:
                        break
                j -= 1
            if j < 0:
                return query
            start = j
            t = j - 1
            while t >= 0 and (query[t].isalnum() or query[t] in "_."):
                t -= 1
            if t + 1 < j and re.match(r"[A-Za-z_]", query[t + 1:j]):
                start = t + 1  # include the function name
        elif query[k].isalnum() or query[k] in "_.\x00":
            t = k
            while t >= 0 and (query[t].isalnum() or query[t] in "_.\x00"):
                t -= 1
            start = t + 1
        else:
            return query
        expr = query[start:k + 1]
        query = (query[:start] + f"CAST({expr} AS {m.group(1)})"
                 + query[m.end():])


def to_spark_sql(query: str, dialect: Optional[str] = None) -> str:
    """Rewrite a user query for Spark. Applied regardless of the declared
    dialect (the rewrites are no-ops on already-Spark SQL). String
    literals are masked for the duration, so no rewrite can mutate a
    quoted value or be confused by quotes containing hyphens/commas."""
    query, _lits = _mask_literals(query)
    out = _rewrite_percentile_cont(query)
    out = _rewrite_extract_epoch(out)
    if (dialect or "").lower() in ("postgres", "postgresql", "redshift", "duckdb"):
        out = _rewrite_pg_casts(out)
    out = re.sub(r"\bnow\s*\(\s*\)", "current_timestamp()", out, flags=re.IGNORECASE)
    fn = _DIALECT_REWRITES.get((dialect or "").lower())
    if fn is not None:
        out = fn(out)
    return _unmask_literals(out, _lits)


# ---------------------------------------------------------------------------
# per-dialect rewrites (round 2: the constructs that genuinely differ)
# ---------------------------------------------------------------------------

_TSQL_DATEDIFF_UNITS = {
    "day": "day", "dd": "day", "d": "day",
    "hour": "hour", "hh": "hour",
    "minute": "minute", "mi": "minute", "n": "minute",
    "second": "second", "ss": "second", "s": "second",
    "month": "month", "mm": "month", "m": "month",
    "year": "year", "yy": "year", "yyyy": "year",
}


def _rewrite_call(query: str, name: str, transform) -> str:
    """Rewrite every ``name(...)`` call with a paren-BALANCED argument capture
    (a ``[^()]*`` regex silently skips any call whose arguments contain a
    nested function call, leaving untranslated T-SQL for Spark to choke on).
    ``transform(inner)`` returns the replacement text or None to leave the
    call untouched."""
    pattern = re.compile(rf"\b{name}\s*\(", re.IGNORECASE)
    pos = 0
    while True:
        m = pattern.search(query, pos)
        if not m:
            return query
        open_idx = query.index("(", m.start())
        close = _matched_paren(query, open_idx)
        if close < 0:
            return query
        repl = transform(query[open_idx + 1:close])
        if repl is None:
            pos = close + 1
            continue
        query = query[:m.start()] + repl + query[close + 1:]
        pos = m.start() + len(repl)


def _rewrite_tsql(query: str) -> str:
    # [bracketed identifiers] -> `backticks`
    out = re.sub(r"\[([A-Za-z_][\w ]*)\]", r"`\1`", query)
    # SELECT TOP n ... -> SELECT ... LIMIT n. Skip only when the query
    # already ends in a top-level LIMIT clause — NOT whenever the substring
    # "limit" appears anywhere (e.g. a column named limit_value).
    m = re.match(r"(?is)^(\s*SELECT)\s+TOP\s+(\d+)\s+(.*)$", out)
    if m and not re.search(r"(?is)\bLIMIT\s+\d+\s*;?\s*$", out):
        out = f"{m.group(1)} {m.group(3).rstrip().rstrip(';')} LIMIT {m.group(2)}"
    out = re.sub(r"\bGETDATE\s*\(\s*\)", "current_timestamp()", out, flags=re.IGNORECASE)
    # 2-arg ISNULL(a, b) -> coalesce(a, b)
    out = re.sub(r"\bISNULL\s*\(", "coalesce(", out, flags=re.IGNORECASE)
    out = re.sub(r"\bLEN\s*\(", "length(", out, flags=re.IGNORECASE)

    # CHARINDEX(sub, s) -> instr(s, sub): swap the two arguments
    def _charindex(inner):
        parts = _split_top_level_comma(inner)
        if parts and len(parts) == 2:
            return f"instr({parts[1]}, {parts[0]})"
        return None
    out = _rewrite_call(out, "CHARINDEX", _charindex)

    # DATEDIFF(unit, start, end) -> Spark datediff/timestampdiff forms
    def _datediff(inner_text):
        inner = _split_top_level_comma(inner_text)
        if not inner or len(inner) != 3:
            return None
        unit = _TSQL_DATEDIFF_UNITS.get(inner[0].strip().lower())
        if unit is None:
            return None
        if unit == "day":
            return f"datediff({inner[2]}, {inner[1]})"
        return f"timestampdiff({unit.upper()}, {inner[1]}, {inner[2]})"
    out = _rewrite_call(out, "DATEDIFF", _datediff)
    return out


def _split_top_level_comma(text: str):
    parts, depth, cur = [], 0, []
    for ch in text:
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        if ch == "," and depth == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _rewrite_bigquery(query: str) -> str:
    return re.sub(r"\bSAFE_DIVIDE\s*\(", "try_divide(", query, flags=re.IGNORECASE)


def _rewrite_snowflake(query: str) -> str:
    out = re.sub(r"\bIFF\s*\(", "if(", query, flags=re.IGNORECASE)
    out = re.sub(r"\bSYSDATE\s*\(\s*\)", "current_timestamp()", out, flags=re.IGNORECASE)
    return out


def _rewrite_oracle(query: str) -> str:
    # SYSDATE +/- n means days in Oracle date arithmetic
    out = re.sub(r"\bSYSDATE\s*([+-])\s*(\d+(?:\.\d+)?)\b",
                 r"current_timestamp() \1 INTERVAL \2 DAY",
                 query, flags=re.IGNORECASE)
    out = re.sub(r"\bSYSDATE\b", "current_timestamp()", out, flags=re.IGNORECASE)
    return out


_DIALECT_REWRITES = {
    "tsql": _rewrite_tsql, "sqlserver": _rewrite_tsql, "mssql": _rewrite_tsql,
    "bigquery": _rewrite_bigquery,
    "snowflake": _rewrite_snowflake,
    "oracle": _rewrite_oracle,
}
