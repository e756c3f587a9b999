"""Full JSON-Schema (draft-07 subset) row validation, Spark-first.

The reference exports each model to a draft-07 JSON Schema
(export/jsonschema_exporter.py:216-231) and validates every JSON row with
fastjsonschema in a driver-side Python loop
(engines/fastjsonschema/check_jsonschema.py:90-114), prefixing failure
messages with the row's primary-key value and capping at ``max_errors``
(default 500, check_jsonschema.py:53-88).

This module re-expresses that at cluster scale:

- :func:`contract_to_jsonschema` mirrors the reference exporter: type/null
  unions, required lists, nested properties, patternProperties, items,
  pattern, enum (logicalTypeOptions, customProperties JSON, quality
  invalidValues), min/maxLength, minimum/maximum, exclusive bounds, formats.
- :func:`validate_json_rows` compiles the schema into **variant-typed
  Column expressions** (Spark 4 ``try_parse_json`` + ``schema_of_variant``
  + ``try_variant_get``): one parse per row inside the JVM, every keyword a
  vectorized predicate, errors collected per row as an array<string>. No
  Python executes per row.
- Schemas using ``patternProperties`` (not expressible as static variant
  paths) fall back to an Arrow-batched ``jsonschema`` validator via
  mapInPandas — distributed and batch-transported, unlike the reference's
  driver loop.

Error messages follow fastjsonschema's shape ("data.x must be string",
"data must contain ['id'] properties") but are not guaranteed byte-equal.
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, List, Optional, Tuple

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datacontract_cli_spark.model.contract import Property, SchemaObject

# --------------------------------------------------------------------------
# contract -> draft-07 schema (mirrors reference jsonschema_exporter.py)
# --------------------------------------------------------------------------

_FORMAT_REGEX = {
    "date-time": r"^\d{4}-\d{2}-\d{2}[Tt ]\d{2}:\d{2}:\d{2}(\.\d+)?([Zz]|[+-]\d{2}:?\d{2})?$",
    "date": r"^\d{4}-\d{2}-\d{2}$",
    "time": r"^\d{2}:\d{2}:\d{2}(\.\d+)?$",
    "email": r"^[^@\s]+@[^@\s]+\.[^@\s]+$",
    "uuid": r"^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$",
    "uri": r"^\w+://",
}


def _json_type(logical: Optional[str], fmt: Optional[str]) -> Tuple[Optional[str], Optional[str]]:
    """logicalType -> (json type, format) — reference convert_type_format."""
    if logical is None:
        return None, None
    lt = logical.lower()
    if lt in ("string", "varchar", "text"):
        return "string", fmt
    if lt in ("timestamp", "timestamp_tz", "date-time", "datetime"):
        return "string", "date-time"
    if lt in ("timestamp_ntz",):
        return "string", None
    if lt == "date":
        return "string", "date"
    if lt == "time":
        return "string", "time"
    if lt in ("number", "decimal", "numeric", "float", "double"):
        return "number", None
    if lt in ("integer", "int", "long", "bigint"):
        return "integer", None
    if lt == "boolean":
        return "boolean", None
    if lt in ("object", "record", "struct"):
        return "object", None
    if lt == "array":
        return "array", None
    return None, None


def _opt(prop: Property, key: str):
    return (prop.options or {}).get(key)


def _enum_values(prop: Property):
    v = _opt(prop, "enum")
    if v:
        return list(v)
    # customProperties may carry a JSON-encoded enum (reference
    # jsonschema_exporter._get_config_value)
    cp = (prop.options or {}).get("customProperties") or {}
    if isinstance(cp, dict) and cp.get("enum"):
        try:
            return json.loads(cp["enum"]) if isinstance(cp["enum"], str) else list(cp["enum"])
        except (json.JSONDecodeError, TypeError):
            pass
    for q in prop.quality or []:
        if getattr(q, "metric", None) == "invalidValues" and getattr(q, "arguments", None):
            vv = q.arguments.get("validValues")
            if vv:
                return list(vv)
    return None


def _prop_to_schema(prop: Property) -> Dict[str, Any]:
    out: Dict[str, Any] = {}
    jt, jf = _json_type(prop.logical_type, _opt(prop, "format"))
    if prop.business_name:
        out["title"] = prop.business_name
    if prop.description:
        out["description"] = prop.description
    if jt is not None:
        out["type"] = jt if prop.required else [jt, "null"]
    if jf is not None:
        out["format"] = jf
    if jt == "object":
        nested = prop.properties or []
        if nested and nested[0].column.startswith("^"):
            out["patternProperties"] = {p.column: _prop_to_schema(p) for p in nested}
        else:
            out["properties"] = {p.column: _prop_to_schema(p) for p in nested}
            out["required"] = [p.column for p in nested if p.required]
    if jt == "array" and prop.items is not None:
        out["items"] = _prop_to_schema(prop.items)
    for key in ("pattern", "minLength", "maxLength", "minimum", "maximum",
                "exclusiveMinimum", "exclusiveMaximum"):
        v = _opt(prop, key)
        if v is not None:
            out[key] = v
    enum = _enum_values(prop)
    if enum:
        out["enum"] = enum
    return out


def contract_to_jsonschema(obj: SchemaObject) -> Dict[str, Any]:
    props = obj.properties or []
    out: Dict[str, Any] = {
        "$schema": "http://json-schema.org/draft-07/schema#",
    }
    if obj.business_name:
        out["title"] = obj.business_name
    if obj.description:
        out["description"] = obj.description
    out.update({
        "type": "object",
        "properties": {p.column: _prop_to_schema(p) for p in props},
        "required": [p.column for p in props if p.required],
    })
    return out


# --------------------------------------------------------------------------
# variant-expression compiler
# --------------------------------------------------------------------------

def _needs_arrow(schema: Dict[str, Any]) -> bool:
    if not isinstance(schema, dict):
        return False
    if "patternProperties" in schema:
        return True
    for key, sub in (schema.get("properties") or {}).items():
        # variant path brackets quote with ' or "; a key containing BOTH has
        # no expressible path — validate such schemas via the Arrow engine
        if "'" in key and '"' in key:
            return True
        if _needs_arrow(sub):
            return True
    items = schema.get("items")
    if isinstance(items, dict) and _needs_arrow(items):
        return True
    return False


def _type_pred(node: Column, jt: str) -> Column:
    """Is the present variant value of JSON type ``jt``?"""
    t = F.schema_of_variant(node)
    if jt == "string":
        return t == "STRING"
    if jt == "integer":
        # fastjsonschema semantics: strict int (5.0 is NOT an integer)
        return t == "BIGINT"
    if jt == "number":
        return (t == "BIGINT") | (t == "DOUBLE") | t.startswith("DECIMAL")
    if jt == "boolean":
        return t == "BOOLEAN"
    if jt == "object":
        return t.startswith("OBJECT") | (t == "VARIANT")  # empty object
    if jt == "array":
        return t.startswith("ARRAY")
    if jt == "null":
        return F.is_variant_null(node)
    return F.lit(True)


_IDENT_RE = re.compile(r"^[A-Za-z_][A-Za-z0-9_]*$")


def _path_segment(key: str) -> str:
    """One variant-path step. Spark's variant path grammar has no backtick
    quoting (``$.`a.b``` silently extracts nothing) — non-identifier keys
    must use bracket syntax ``$['a.b']`` / ``$["q't"]`` (verified live; no
    escape sequence exists, so a key with both quote styles is routed to the
    Arrow engine by :func:`_needs_arrow`)."""
    if _IDENT_RE.match(key):
        return "." + key
    if "'" not in key:
        return "['" + key + "']"
    return '["' + key + '"]'


def variant_path(path: List[str]) -> str:
    return "$" + "".join(_path_segment(p) for p in path)


def _node(vcol: Column, path: List[str]) -> Column:
    if not path:
        return vcol
    return F.try_variant_get(vcol, variant_path(path), "variant")


def _as_string(node: Column) -> Column:
    return F.try_variant_get(node, "$", "string")


def _as_double(node: Column) -> Column:
    return F.try_variant_get(node, "$", "double")


def _present(node: Column) -> Column:
    """Key exists in the document (JSON null counts as present)."""
    return node.isNotNull()


def _is_json_null(node: Column) -> Column:
    return F.is_variant_null(node)


def _enum_member_pred(node: Column, is_str: Column, sval: Column,
                      is_num: Column, nval: Column, values: List[Any]) -> Column:
    """TRUE iff the present value is a member of ``values`` — never SQL NULL
    (a JSON-null value makes ``sval.isin`` NULL, which an un-coalesced ~ok
    would silently swallow)."""
    non_null = [v for v in values if v is not None]
    if non_null and all(isinstance(v, str) for v in non_null):
        ok = is_str & sval.isin(non_null)
    elif non_null and all(isinstance(v, (int, float)) and not isinstance(v, bool)
                          for v in non_null):
        ok = is_num & nval.isin([float(v) for v in non_null])
    elif non_null:  # mixed enums: compare canonical string form
        ok = sval.isin([json.dumps(v) if not isinstance(v, str) else v
                        for v in non_null])
    else:
        ok = F.lit(False)
    return F.coalesce(ok, F.lit(False)) | (_is_json_null(node) & F.lit(None in values))


def _keyword_errors(node: Column, schema: Dict[str, Any], label: str) -> List[Column]:
    """Error expressions for one schema node; each is NULL when the keyword
    passes (or does not apply) and an error string when it fails."""
    errs: List[Column] = []
    present = _present(node) & ~_is_json_null(node)

    jt = schema.get("type")
    if jt is not None:
        types = jt if isinstance(jt, list) else [jt]
        ok = F.lit(False)
        for t in types:
            ok = ok | (_type_pred(node, t) if t != "null" else _is_json_null(node))
        type_desc = " or ".join(types)
        errs.append(F.when(_present(node) & ~ok,
                           F.lit(f"{label} must be {type_desc}")))

    is_str = _type_pred(node, "string")
    sval = _as_string(node)
    if "pattern" in schema:
        errs.append(F.when(present & is_str & ~sval.rlike(schema["pattern"]),
                           F.lit(f"{label} must match pattern {schema['pattern']}")))
    if "minLength" in schema:
        errs.append(F.when(present & is_str & (F.length(sval) < int(schema["minLength"])),
                           F.lit(f"{label} must be longer than or equal to "
                                 f"{schema['minLength']} characters")))
    if "maxLength" in schema:
        errs.append(F.when(present & is_str & (F.length(sval) > int(schema["maxLength"])),
                           F.lit(f"{label} must be shorter than or equal to "
                                 f"{schema['maxLength']} characters")))
    if "format" in schema and schema["format"] in _FORMAT_REGEX:
        rx = _FORMAT_REGEX[schema["format"]]
        errs.append(F.when(present & is_str & ~sval.rlike(rx),
                           F.lit(f"{label} must be {schema['format']}")))

    is_num = _type_pred(node, "number")
    nval = _as_double(node)
    for key, op, word in (("minimum", "__ge__", "bigger than or equal to"),
                          ("maximum", "__le__", "smaller than or equal to"),
                          ("exclusiveMinimum", "__gt__", "bigger than"),
                          ("exclusiveMaximum", "__lt__", "smaller than")):
        if key in schema:
            bound = float(schema[key])
            ok = getattr(nval, op)(F.lit(bound))
            errs.append(F.when(present & is_num & ~ok,
                               F.lit(f"{label} must be {word} {bound}")))

    for kw, values in (("enum", schema.get("enum")),
                       ("const", [schema["const"]] if "const" in schema else None)):
        if values is None:
            continue
        # JSON Schema: enum/const apply to EVERY instance value including
        # JSON null — null passes only when null is itself a member
        # (reference arbiter: the jsonschema lib, check_jsonschema.py:90-114)
        ok = _enum_member_pred(node, is_str, sval, is_num, nval, values)
        word = "one of" if kw == "enum" else "same as"
        shown = values if kw == "enum" else values[0]
        errs.append(F.when(_present(node) & ~ok,
                           F.lit(f"{label} must be {word} {shown}")))

    # nested object keywords
    for key in schema.get("required") or []:
        child = _node(node, [key])
        errs.append(F.when(present & _type_pred(node, "object") & ~_present(child),
                           F.lit(f"{label} must contain ['{key}'] properties")))
    for key, sub in (schema.get("properties") or {}).items():
        errs.extend(_keyword_errors(_node(node, [key]), sub, f"{label}.{key}"))

    # array items: per-element predicate; report the count of bad elements
    items = schema.get("items")
    if isinstance(items, dict) and items:
        elems = F.try_variant_get(node, "$", "array<variant>")
        bad = F.size(F.filter(elems, lambda e: ~_item_valid(e, items)))
        errs.append(F.when(present & _type_pred(node, "array") & (bad > 0),
                           F.concat(F.lit(f"{label}[] "), bad.cast("string"),
                                    F.lit(" items violate the item schema"))))
    return errs


def _item_valid(node: Column, schema: Dict[str, Any]) -> Column:
    """Boolean validity of one array element (recursion in predicate form —
    lambda variables cannot carry per-element error strings cheaply)."""
    ok = F.lit(True)
    jt = schema.get("type")
    if jt is not None:
        types = jt if isinstance(jt, list) else [jt]
        tok = F.lit(False)
        for t in types:
            tok = tok | (_type_pred(node, t) if t != "null" else _is_json_null(node))
        ok = ok & tok
    sval = _as_string(node)
    if "pattern" in schema:
        ok = ok & (~_type_pred(node, "string") | sval.rlike(schema["pattern"]))
    if "enum" in schema:
        ok = ok & _enum_member_pred(node, _type_pred(node, "string"), sval,
                                    _type_pred(node, "number"), _as_double(node),
                                    schema["enum"])
    if "const" in schema:
        ok = ok & _enum_member_pred(node, _type_pred(node, "string"), sval,
                                    _type_pred(node, "number"), _as_double(node),
                                    [schema["const"]])
    for key in schema.get("required") or []:
        ok = ok & _present(_node(node, [key]))
    for key, sub in (schema.get("properties") or {}).items():
        ok = ok & _item_valid(_node(node, [key]), sub)
    return ok


def compile_errors_column(json_col: str, schema: Dict[str, Any]) -> Column:
    """array<string> of validation errors for a JSON string column (empty =
    valid; ["<corrupt>"] when the text does not parse)."""
    v = F.try_parse_json(F.col(json_col))
    errs = []
    for key in schema.get("required") or []:
        errs.append(F.when(~_present(_node(v, [key])),
                           F.lit(f"data must contain ['{key}'] properties")))
    for key, sub in (schema.get("properties") or {}).items():
        errs.extend(_keyword_errors(_node(v, [key]), sub, f"data.{key}"))
    arr = F.filter(F.array(*errs), lambda e: e.isNotNull()) if errs else F.array().cast("array<string>")
    out = (
        F.when(F.col(json_col).isNull(), F.array(F.lit("data must not be null")))
        .when(v.isNull(), F.array(F.lit("data is not parseable JSON")))
    )
    # root type: a scalar document like `5` violates {"type": "object"} even
    # when no required/properties keyword fires (reference fastjsonschema:
    # "data must be object")
    root = schema.get("type")
    if root is not None:
        types = root if isinstance(root, list) else [root]
        root_ok = F.lit(False)
        for t in types:
            root_ok = root_ok | (_type_pred(v, t) if t != "null" else _is_json_null(v))
        out = out.when(~root_ok, F.array(F.lit(f"data must be {' or '.join(types)}")))
    return out.otherwise(arr)


# --------------------------------------------------------------------------
# Arrow fallback (full surface incl. patternProperties)
# --------------------------------------------------------------------------

def _arrow_errors(df: DataFrame, json_col: str, schema: Dict[str, Any],
                  keep_cols: List[str]) -> DataFrame:
    import pandas as pd

    schema_json = json.dumps(schema)
    out_fields = "".join(f"`{c}` {dict(df.dtypes)[c]}, " for c in keep_cols)

    def kernel(batches):
        import jsonschema

        # reference semantics come from fastjsonschema, whose "integer" is
        # STRICT (5.0 is not an integer); the jsonschema library's draft-07
        # type checker accepts integral floats — redefine it so both our
        # engines and the reference agree
        strict_int = jsonschema.Draft7Validator.TYPE_CHECKER.redefine(
            "integer",
            lambda checker, inst: isinstance(inst, int) and not isinstance(inst, bool),
        )
        validator_cls = jsonschema.validators.extend(
            jsonschema.Draft7Validator, type_checker=strict_int)
        validator = validator_cls(json.loads(schema_json))
        for pdf in batches:
            errors = []
            for txt in pdf[json_col]:
                if txt is None:
                    errors.append(["data must not be null"])
                    continue
                try:
                    obj = json.loads(txt)
                except (json.JSONDecodeError, TypeError):
                    errors.append(["data is not parseable JSON"])
                    continue
                msgs = []
                for e in validator.iter_errors(obj):
                    path = ".".join(str(p) for p in e.absolute_path)
                    msgs.append(f"data{'.' + path if path else ''} {e.message}"
                                if not path else f"data.{path}: {e.message}")
                errors.append(sorted(msgs))
            res = pdf[keep_cols].copy()
            res["errors"] = errors
            yield res

    return df.mapInPandas(kernel, f"{out_fields}errors array<string>")


# --------------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------------

def validate_json_rows(
    df: DataFrame,
    json_col: str,
    schema_or_obj,
    keep_cols: Optional[List[str]] = None,
    engine: str = "auto",
) -> DataFrame:
    """Rows + an ``errors array<string>`` column (empty array = valid row).

    engine="auto" compiles variant Column expressions when the schema is
    expressible (everything except patternProperties) and falls back to the
    Arrow ``jsonschema`` kernel otherwise; "column"/"arrow" force a path."""
    schema = (contract_to_jsonschema(schema_or_obj)
              if isinstance(schema_or_obj, SchemaObject) else schema_or_obj)
    keep = keep_cols if keep_cols is not None else [c for c in df.columns]
    if engine == "arrow" or (engine == "auto" and _needs_arrow(schema)):
        return _arrow_errors(df, json_col, schema, keep)
    return df.select(*keep, compile_errors_column(json_col, schema).alias("errors"))


def json_schema_violations(
    df: DataFrame,
    json_col: str,
    schema_or_obj,
    pk_col: Optional[str] = None,
    max_errors: int = 500,
    engine: str = "auto",
) -> Tuple[int, int, List[str]]:
    """(row_count, invalid_count, capped messages) — reference semantics:
    messages are '#<pk>: <error>' when a primary key exists
    (check_jsonschema.py:100-110), capped at max_errors (:53-88).

    ``pk_col`` may be a DataFrame column OR a top-level JSON field name of
    the documents (the reference reads it from the parsed object,
    check_jsonschema.py:43-50)."""
    if pk_col and pk_col not in df.columns:
        df = df.withColumn(
            "__dc_pk__",
            F.try_variant_get(F.try_parse_json(F.col(json_col)),
                              variant_path([pk_col]), "string"),
        )
        pk_col = "__dc_pk__"
    keep = [pk_col] if pk_col else []
    validated = validate_json_rows(df, json_col, schema_or_obj, keep_cols=keep,
                                   engine=engine)
    validated = validated.persist()
    try:
        counts = validated.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum((F.size("errors") > 0).cast("long")).alias("bad"),
        ).collect()[0]
        bad_rows = validated.filter(F.size("errors") > 0)
        if pk_col:
            bad_rows = bad_rows.orderBy(pk_col)
        sample = bad_rows.select(*keep, "errors").limit(max_errors).collect()
    finally:
        validated.unpersist()
    messages: List[str] = []
    for r in sample:
        prefix = f"#{r[pk_col]}: " if pk_col and r[pk_col] is not None else ""
        for m in r["errors"]:
            if len(messages) >= max_errors:
                break
            messages.append(prefix + m)
    return int(counts["n"]), int(counts["bad"] or 0), messages


# --------------------------------------------------------------------------
# Per-tool argument validation (transcript tool-call lane)
# --------------------------------------------------------------------------

def validate_tool_args(
    df: DataFrame,
    schemas: Dict[str, Dict[str, Any]],
    tool_col: str = "tool",
    args_col: str = "args",
    unknown: str = "ignore",
) -> DataFrame:
    """Rows + ``errors array<string>``, the JSON Schema chosen PER ROW by
    the tool column — the transcript tool-call check: every tool in an
    agent trace carries its own argument schema, and a single pass must
    validate them all.

    One chained CASE over the compiled variant Column expressions: each
    tool's keywords become vectorized predicates on the same
    ``try_parse_json`` (Spark's codegen subexpression elimination shares
    the parse across branches), so the whole validation is one narrow
    projection — no shuffle, no Python, scales linearly with rows and not
    with the number of tools. ``unknown``: "ignore" gives rows whose tool
    has no schema an empty error array; "flag" reports them.

    Schemas needing the Arrow fallback (patternProperties) are rejected —
    run those tools through :func:`validate_json_rows` separately."""
    for t, s in schemas.items():
        if _needs_arrow(s):
            raise ValueError(
                f"tool '{t}': patternProperties schemas are not "
                f"expressible as a CASE branch; validate that tool via "
                f"validate_json_rows(engine='arrow')")
    if unknown not in ("ignore", "flag"):
        raise ValueError("unknown must be 'ignore' or 'flag'")
    empty = F.array().cast("array<string>")
    expr = None
    for t, s in schemas.items():
        errs = compile_errors_column(args_col, s)
        cond = F.col(tool_col) == F.lit(t)
        expr = F.when(cond, errs) if expr is None else expr.when(cond, errs)
    if expr is None:
        fallback = empty
    elif unknown == "flag":
        fallback = F.array(F.concat(
            F.lit("unknown tool '"),
            F.coalesce(F.col(tool_col).cast("string"), F.lit("null")),
            F.lit("'")))
    else:
        fallback = empty
    expr = fallback if expr is None else expr.otherwise(fallback)
    return df.withColumn("errors", expr)


def tool_args_violation_counts(
    df: DataFrame,
    schemas: Dict[str, Dict[str, Any]],
    tool_col: str = "tool",
    args_col: str = "args",
    unknown: str = "ignore",
) -> DataFrame:
    """(tool, n_rows, n_invalid) per tool value — the summary lane over
    :func:`validate_tool_args`; one scan, one small groupBy(tool)."""
    validated = validate_tool_args(df, schemas, tool_col, args_col, unknown)
    return (validated.groupBy(F.col(tool_col).alias("tool"))
            .agg(F.count(F.lit(1)).alias("n_rows"),
                 F.sum((F.size("errors") > 0).cast("long"))
                 .cast("bigint").alias("n_invalid")))
