"""SQL DDL importer: CREATE TABLE script -> DataContract.

Reference behavior: datacontract/imports/sql_importer.py — parse a DDL
script (any of ~10 dialects via sqlglot), emit one schema object per CREATE
TABLE with per-column logicalType/physicalType, maxLength for char types,
precision/scale for numerics (as customProperties), NOT NULL -> required,
PRIMARY KEY -> primaryKey with 1-based positions in declaration order,
COMMENT -> description, plus a placeholder server block per dialect
(sql_importer.py:56-66, get_server_defaults :160-188). Templating tokens
``$(var)``/``${var}``/``{{var}}`` are replaced with the bare variable name
before parsing (remove_variable_tokens, :378-386).

sqlglot is not available in this image, so this module carries a small
dialect-tolerant CREATE TABLE parser: quoted identifiers in any of the
three quoting styles (double quotes, backticks, [brackets]), multi-word
types (DOUBLE PRECISION, CHARACTER VARYING(n), TIMESTAMP WITH TIME ZONE),
inline and table-level PRIMARY KEY constraints, NOT NULL / UNIQUE /
DEFAULT / COMMENT column constraints, and trailing ``-- comment``
descriptions. The logical-type mapping mirrors the reference's
map_type_from_sql (sql_importer.py:289-376) so categories match
byte-for-byte.
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from datacontract_cli_spark.model.contract import (
    DataContract,
    Property,
    SchemaObject,
    Server,
)


def remove_variable_tokens(sql: str) -> str:
    """$(var) (sqlcmd) / ${var} (Liquibase) / {{var}} (dbt) -> var."""
    pattern = re.compile(r"\$\((\w+)\)|\$\{(\w+)\}|\{\{(\w+)\}\}")
    return pattern.sub(lambda m: m.group(1) or m.group(2) or m.group(3), sql)


# ---------------------------------------------------------------------------
# lexer-lite helpers (quote/paren aware)
# ---------------------------------------------------------------------------

_QUOTE_CLOSERS = {'"': '"', "`": "`", "[": "]"}


def _split_top_level(text: str, sep: str = ",") -> List[str]:
    parts, depth, angle, cur, i = [], 0, 0, [], 0
    while i < len(text):
        ch = text[i]
        if ch == "'":
            j = i + 1
            while j < len(text):
                if text[j] == "'" and j + 1 < len(text) and text[j + 1] == "'":
                    j += 2
                    continue
                if text[j] == "'":
                    break
                j += 1
            cur.append(text[i:j + 1])
            i = j + 1
            continue
        if ch in _QUOTE_CLOSERS:
            # quoted identifier ("a.b", `a.b`, [a b]) — the separator and
            # bracket characters inside it are part of the name
            closer = _QUOTE_CLOSERS[ch]
            j = text.find(closer, i + 1)
            j = len(text) - 1 if j < 0 else j
            cur.append(text[i:j + 1])
            i = j + 1
            continue
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "<" and cur and (cur[-1].isalnum() or cur[-1] in "_>"):
            # generic type bracket (ARRAY<...>, STRUCT<a: INT, b: STRING>) —
            # only when directly after an identifier, so comparison operators
            # in CHECK constraints don't unbalance the scan
            angle += 1
        elif ch == ">" and angle > 0:
            angle -= 1
        if ch == sep and depth == 0 and angle == 0:
            parts.append("".join(cur).strip())
            cur = []
        else:
            cur.append(ch)
        i += 1
    tail = "".join(cur).strip()
    if tail:
        parts.append(tail)
    return parts


def _matched_paren(text: str, open_idx: int) -> int:
    depth, i = 0, open_idx
    while i < len(text):
        ch = text[i]
        if ch == "'":  # skip string literals
            i += 1
            while i < len(text) and text[i] != "'":
                i += 1
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
            if depth == 0:
                return i
        i += 1
    return -1


_IDENT = r'(?:"[^"]+"|`[^`]+`|\[[^\]]+\]|[A-Za-z_][\w$]*)'


def _unquote(ident: str) -> str:
    ident = ident.strip()
    if len(ident) >= 2 and (
        (ident[0] == '"' and ident[-1] == '"')
        or (ident[0] == "`" and ident[-1] == "`")
        or (ident[0] == "[" and ident[-1] == "]")
    ):
        return ident[1:-1]
    return ident


# ---------------------------------------------------------------------------
# type parsing + logical mapping (mirrors reference map_type_from_sql)
# ---------------------------------------------------------------------------

# multi-word physical types: the words that may follow the head type token
_TYPE_CONTINUATIONS = {
    ("double",): {"precision"},
    ("character",): {"varying"},
    ("time",): {"with", "without"},
    ("timestamp",): {"with", "without"},
    ("with",): {"time", "local"},
    ("without",): {"time"},
    ("local",): {"time"},
    ("time", "zone"): set(),
}
_AFTER_WITH = {"time", "local", "zone"}


def _parse_type(rest: str) -> Tuple[str, str]:
    """(physical type text, remainder) from the text following the column
    name. Consumes the head word, an optional (params), and multi-word
    continuations like WITH TIME ZONE / PRECISION / VARYING."""
    m = re.match(r"\s*([A-Za-z_]\w*)", rest)
    if not m:
        return "", rest
    words = [m.group(1)]
    pos = m.end()
    pm = re.match(r"\s*\(", rest[pos:])
    params = ""
    if pm:
        open_idx = pos + pm.end() - 1
        close = _matched_paren(rest, open_idx)
        if close > 0:
            params = rest[open_idx:close + 1]
            pos = close + 1
    # multi-word continuations
    while True:
        nm = re.match(r"\s+([A-Za-z_]\w*)", rest[pos:])
        if not nm:
            break
        nxt = nm.group(1).lower()
        prev = words[-1].lower()
        interval_tail = (words[0].lower() == "interval" and
                         nxt in ("year", "month", "day", "hour", "minute",
                                 "second", "to"))
        if (prev in ("double",) and nxt == "precision") or \
           (prev in ("character", "national") and nxt == "varying") or \
           (prev in ("time", "timestamp") and nxt in ("with", "without")) or \
           (prev in ("with", "without") and nxt in _AFTER_WITH) or \
           (prev in ("time", "local") and nxt == "zone") or interval_tail:
            words.append(nm.group(1))
            pos += nm.end()
            # params may follow the full multi-word head (varying(255))
            pm = re.match(r"\s*\(", rest[pos:])
            if pm and not params:
                open_idx = pos + pm.end() - 1
                close = _matched_paren(rest, open_idx)
                if close > 0:
                    params = rest[open_idx:close + 1]
                    pos = close + 1
        else:
            break
    head = " ".join(words)
    # nested generics: ARRAY<...>, STRUCT<...>, MAP<...>
    gm = re.match(r"\s*<", rest[pos:])
    if gm and head.lower() in ("array", "struct", "map"):
        depth, i = 0, pos + gm.end() - 1
        while i < len(rest):
            if rest[i] == "<":
                depth += 1
            elif rest[i] == ">":
                depth -= 1
                if depth == 0:
                    break
            i += 1
        head += rest[pos:i + 1].strip()
        pos = i + 1
        params = ""
    return (head + params).strip(), rest[pos:]


def map_type_from_sql(sql_type: Optional[str]) -> Tuple[Optional[str], Optional[str]]:
    """SQL type -> (ODCS logicalType, format) — the reference's decision
    table (sql_importer.py:289-376), same prefix/suffix tests in the same
    order so outputs are identical (e.g. VARCHAR2 -> string via the varchar
    prefix, BINARY_FLOAT -> string/binary via the binary prefix, TINYINT ->
    integer via the int suffix)."""
    if sql_type is None:
        return "string", None
    t = sql_type.lower().strip()
    for prefix in ("varchar", "char", "string", "nchar", "text", "nvarchar",
                   "ntext"):
        if t.startswith(prefix):
            return "string", None
    # the int test is a SUFFIX test (tinyint/smallint/bigint) — strip any
    # parameter list first so MySQL's INT(11)/BIGINT(20) still match
    head = t.split("(")[0].strip()
    if (head.endswith("int") and not head.endswith("point")) or head.endswith("integer"):
        return "integer", None
    for prefix in ("float", "double", "number", "numeric", "decimal", "money"):
        if t.startswith(prefix):
            return "number", None
    if t == "real":
        return "number", None
    if t.startswith("bool") or t.startswith("bit"):
        return "boolean", None
    for prefix in ("binary", "varbinary", "raw", "bytea"):
        if t.startswith(prefix):
            return "string", "binary"
    if t in ("blob", "bfile", "image"):
        return "string", "binary"
    if t == "date":
        return "date", None
    if t == "time" or t.startswith("time(") or t.startswith("time "):
        return "time", None
    if t == "timetz":
        return "time", None
    if t.startswith("timestamp") or t == "smalldatetime" or t.startswith("datetime"):
        return "timestamp", None
    if t == "uniqueidentifier":
        return "string", "uuid"
    if t == "json":
        return "object", None
    if t in ("xml", "clob", "nclob"):
        return "string", None
    if t.startswith("array"):
        return "array", None
    if t.startswith("struct"):
        return "object", None
    if t.startswith("map"):
        # ODCS v3.1 has no map logical type; leave unset (reference note)
        return None, None
    return None, None


def _type_params(phys: str) -> List[str]:
    m = re.search(r"\(([^)]*)\)", phys)
    if not m:
        return []
    return [p.strip() for p in m.group(1).split(",") if p.strip()]


def _max_length(phys: str) -> Optional[int]:
    head = re.split(r"[(\s]", phys.lower(), 1)[0]
    if head not in ("varchar", "char", "nvarchar", "nchar", "character"):
        return None
    params = _type_params(phys)
    val = params[0] if len(params) == 1 else (params[1] if len(params) == 2 else None)
    return int(val) if val is not None and val.isdigit() else None


def _precision_scale(phys: str) -> Tuple[Optional[int], Optional[int]]:
    head = re.split(r"[(\s]", phys.lower(), 1)[0]
    if head not in ("decimal", "numeric", "float", "number"):
        return None, None
    params = _type_params(phys)
    if len(params) == 1 and params[0].isdigit():
        return int(params[0]), 0
    if len(params) == 2 and params[0].isdigit() and params[1].isdigit():
        return int(params[0]), int(params[1])
    return None, None


# ---------------------------------------------------------------------------
# column / constraint parsing
# ---------------------------------------------------------------------------

_CONSTRAINT_HEADS = ("constraint", "primary", "foreign", "unique", "check",
                     "key", "index", "exclude", "like", "period")


def _parse_column(item: str, trailing_comment: Optional[str]) -> Optional[Property]:
    m = re.match(rf"\s*({_IDENT})", item)
    if not m:
        return None
    name = _unquote(m.group(1))
    phys, rest = _parse_type(item[m.end():])
    if not phys:
        return None
    rest_l = " " + re.sub(r"\s+", " ", rest.lower()) + " "
    required = " not null " in rest_l
    is_pk = bool(re.search(r"\bprimary\s+key\b", rest_l))
    unique = bool(re.search(r"\bunique\b", rest_l))
    cm = re.search(r"\bCOMMENT\s+'((?:[^']|'')*)'", rest, re.IGNORECASE)
    description = cm.group(1).replace("''", "'") if cm else trailing_comment
    logical, fmt = map_type_from_sql(phys)
    options: Dict[str, object] = {}
    ml = _max_length(phys)
    if ml is not None:
        options["maxLength"] = ml
    if fmt is not None:
        options["format"] = fmt
    precision, scale = _precision_scale(phys)
    custom: Dict[str, object] = {}
    if precision is not None:
        custom["precision"] = precision
        custom["scale"] = scale
    if description:
        custom["description"] = description
    if custom:
        options["customProperties"] = custom
    return Property(
        name=name,
        logical_type=logical,
        physical_type=phys,
        required=required or is_pk,
        unique=unique,
        primary_key=is_pk,
        options=options,
    )


def _table_pk_columns(item: str) -> Optional[List[str]]:
    m = re.match(
        rf"\s*(?:CONSTRAINT\s+{_IDENT}\s+)?PRIMARY\s+KEY\s*\(",
        item, re.IGNORECASE)
    if not m:
        return None
    close = _matched_paren(item, m.end() - 1)
    inner = item[m.end():close if close > 0 else len(item)]
    return [_unquote(re.sub(r"\s+(ASC|DESC)\s*$", "", c.strip(), flags=re.IGNORECASE))
            for c in _split_top_level(inner)]


_CREATE_RE = re.compile(
    rf"\bCREATE\s+(?:OR\s+REPLACE\s+)?(?:GLOBAL\s+|LOCAL\s+)?"
    rf"(?:TEMP(?:ORARY)?\s+)?(?:TRANSIENT\s+)?(?:EXTERNAL\s+)?TABLE\s+"
    rf"(?:IF\s+NOT\s+EXISTS\s+)?((?:{_IDENT}\.)*{_IDENT})\s*\(",
    re.IGNORECASE,
)


def _column_comments(sql: str, clean: str) -> Dict[int, str]:
    """start-offset -> '--' comment text. Derived from the positions the
    literal-aware comment stripper blanked, so quotes are handled once."""
    out: Dict[int, str] = {}
    i = 0
    while i < len(sql):
        if sql.startswith("--", i) and clean[i] == " ":
            j = sql.find("\n", i)
            j = len(sql) if j < 0 else j
            text = sql[i + 2:j].strip()
            if text:
                out[i] = text
            i = j
        else:
            i += 1
    return out


def _strip_line_comments(sql: str) -> str:
    """Remove -- comments (outside string literals AND quoted identifiers),
    preserving offsets by replacing with spaces so comment positions can be
    correlated."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        ch = sql[i]
        if ch == "'":
            i += 1
            while i < n and sql[i] != "'":
                i += 1
        elif ch in _QUOTE_CLOSERS:
            closer = _QUOTE_CLOSERS[ch]
            i += 1
            while i < n and sql[i] != closer:
                i += 1
        elif ch == "-" and i + 1 < n and sql[i + 1] == "-":
            while i < n and sql[i] != "\n":
                out[i] = " "
                i += 1
            continue
        i += 1
    return "".join(out)


_SERVER_TYPES = {
    "tsql": "sqlserver", "sqlserver": "sqlserver", "postgres": "postgres",
    "postgresql": "postgres", "bigquery": "bigquery", "snowflake": "snowflake",
    "redshift": "redshift", "oracle": "oracle", "mysql": "mysql",
    "databricks": "databricks",
}
_SERVER_PORTS = {"postgres": 5432, "redshift": 5439, "mysql": 3306,
                 "sqlserver": 1433, "oracle": 1521, "snowflake": 443,
                 "databricks": 443}


def _server_stub(dialect: Optional[str]) -> List[Server]:
    server_type = _SERVER_TYPES.get((dialect or "").lower())
    if server_type is None:
        return []
    options: Dict[str, object] = {
        "host": "my_host",
        "database": "my_database",
    }
    port = _SERVER_PORTS.get(server_type)
    if port is not None:
        options["port"] = port
    return [Server(
        server=server_type, type=server_type,
        schema_="public" if server_type in ("postgres", "redshift") else "my_schema",
        options=options,
    )]


def import_sql_ddl(sql: str, dialect: Optional[str] = None,
                   contract_id: Optional[str] = None) -> DataContract:
    """Parse a CREATE TABLE script into a DataContract (one schema object
    per table). Raises ValueError when no CREATE TABLE is found."""
    sql = remove_variable_tokens(sql)
    clean = _strip_line_comments(sql)
    comments = _column_comments(sql, clean)

    objects: List[SchemaObject] = []
    for m in _CREATE_RE.finditer(clean):
        qualified = m.group(1)
        table = _unquote(_split_top_level(qualified, ".")[-1]
                         if "." in qualified else qualified)
        open_idx = m.end() - 1
        close = _matched_paren(clean, open_idx)
        if close < 0:
            continue
        body = clean[open_idx + 1:close]
        body_start = open_idx + 1

        props: List[Property] = []
        table_pk: Optional[List[str]] = None
        offset = 0
        for item in _split_top_level(body):
            item_start = body.index(item, offset)
            offset = item_start + len(item)
            head = item.strip().split(None, 1)
            if head and head[0].lower() in _CONSTRAINT_HEADS:
                pk = _table_pk_columns(item)
                if pk:
                    table_pk = pk
                continue
            # trailing -- comment on the item's last line (description lane)
            item_end = body_start + item_start + len(item)
            line_end = sql.find("\n", item_end)
            line_end = len(sql) if line_end < 0 else line_end
            trailing = None
            for coff, text in comments.items():
                if item_end <= coff < line_end:
                    trailing = text
                    break
            prop = _parse_column(item, trailing)
            if prop is not None:
                props.append(prop)

        if table_pk:
            by_name = {p.name.lower(): p for p in props}
            for pos, col in enumerate(table_pk, start=1):
                p = by_name.get(col.lower())
                if p is not None:
                    p.primary_key = True
                    p.primary_key_position = pos
                    p.required = True
        else:
            pos = 1
            for p in props:
                if p.primary_key:
                    p.primary_key_position = pos
                    pos += 1
        objects.append(SchemaObject(name=table, physical_name=table,
                                    properties=props))

    if not objects:
        raise ValueError("no CREATE TABLE statement found in SQL source")
    return DataContract(
        id=contract_id or "my-data-contract",
        version="1.0.0",
        schema_objects=objects,
        servers=_server_stub(dialect),
    )


def import_sql_file(path: str, dialect: Optional[str] = None,
                    contract_id: Optional[str] = None) -> DataContract:
    with open(path, "r", encoding="utf-8") as f:
        return import_sql_ddl(f.read(), dialect=dialect, contract_id=contract_id)
