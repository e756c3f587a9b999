"""Declared physicalType vs actual Spark type comparison.

The reference compares the contract's declared ``physicalType`` string
against the catalog's native type through sqlglot with dialect alias
families (datacontract/engines/checks/physical_type_match.py:216-264).
sqlglot is not available in this environment, so this is a small
self-contained comparator: parse ``name(p1, p2)`` shapes, normalize the base
name through alias families, and compare parameters only when both sides
declare them. Returns a tri-state: True (match), False (mismatch),
None (unverifiable — e.g. an exotic type we cannot parse), mirroring the
reference's match/mismatch/warn behavior.
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple

_ALIAS_FAMILIES = [
    {"string", "varchar", "text", "char", "character varying", "nvarchar", "clob", "bpchar"},
    {"long", "bigint", "int8", "int64"},
    {"int", "integer", "int4", "int32"},
    {"short", "smallint", "int2", "int16"},
    {"byte", "tinyint", "int1"},
    {"double", "double precision", "float8", "float64"},
    {"float", "real", "float4", "float32"},
    {"decimal", "numeric", "number", "dec"},
    {"boolean", "bool"},
    {"timestamp", "datetime", "timestamp without time zone", "timestamp_ntz"},
    {"timestamp_ltz", "timestamptz", "timestamp with time zone", "timestamp_tz"},
    {"date"},
    {"time", "time without time zone"},
    {"binary", "varbinary", "bytea", "blob", "bytes"},
]

_FAMILY_OF = {}
for fam in _ALIAS_FAMILIES:
    canon = sorted(fam)[0]
    for name in fam:
        _FAMILY_OF[name] = canon

_TYPE_RE = re.compile(r"^\s*([a-zA-Z_][a-zA-Z_0-9 ]*?)\s*(?:\(\s*([0-9]+(?:\s*,\s*[0-9]+)*)\s*\))?\s*$")


def parse_type(raw: str) -> Optional[Tuple[str, List[int]]]:
    """'varchar(255)' -> ('varchar', [255]); 'decimal(10,2)' -> ('decimal', [10, 2])."""
    if raw is None:
        return None
    # nested/complex types are handled structurally elsewhere
    if any(ch in raw for ch in "<>"):
        base = raw.split("<", 1)[0].strip().lower()
        return (base, []) if base else None
    m = _TYPE_RE.match(str(raw).lower())
    if not m:
        return None
    base = m.group(1).strip()
    params = [int(p.strip()) for p in m.group(2).split(",")] if m.group(2) else []
    return base, params


def physical_types_match(declared: str, actual: str) -> Optional[bool]:
    """Tri-state comparison of two physical type strings.

    True: same family (and same parameters when both declare them).
    False: different families or conflicting parameters.
    None: at least one side cannot be parsed → unverifiable.
    """
    d = parse_type(declared)
    a = parse_type(actual)
    if d is None or a is None:
        return None
    d_base, d_params = d
    a_base, a_params = a
    d_fam = _FAMILY_OF.get(d_base)
    a_fam = _FAMILY_OF.get(a_base)
    if d_fam is None or a_fam is None:
        # unknown base name(s): exact-string equality or unverifiable
        if d_base == a_base:
            return _params_match(d_params, a_params)
        return None
    if d_fam != a_fam:
        return False
    return _params_match(d_params, a_params)


def _params_match(declared: List[int], actual: List[int]) -> bool:
    if not declared or not actual:
        return True  # a side without parameters accepts any parameterization
    return declared == actual
