"""Power BI semantic-model importer: .pbit / .bim / model.bim JSON ->
DataContract.

Reference behavior: datacontract/imports/powerbi_importer.py — the TMSL
"BIM" document is read from a .pbit ZIP (entry ``DataModelSchema``,
UTF-16 LE) or directly from a .bim/.json file; tables map to schema
objects (engine-internal LocalDateTable_/DateTableTemplate_ tables and
rowNumber columns skipped, calculated tables/columns flagged in
physicalType), columns carry the PBI→ODCS type map with
isNullable→required and formatString/displayFolder/summarizeBy/isHidden
as customProperties, measures become `physicalType: measure` properties
with a format-string-inferred return type and the DAX expression
preserved, and relationships land on the many side as
customProperties.references (table.column, normalized names).
"""

from __future__ import annotations

import json
import re
import zipfile
from typing import Any, Dict, List, Optional

from datacontract_cli_spark.model.contract import (
    DataContract,
    Property,
    SchemaObject,
    Server,
)

_PBI_TYPES = {
    "string": ("string", None), "int64": ("integer", None),
    "double": ("number", None), "decimal": ("number", None),
    "boolean": ("boolean", None), "datetime": ("timestamp", None),
    "date": ("date", None), "time": ("time", None),
    "binary": ("string", "binary"), "duration": ("string", None),
    "unknown": ("string", None), "variant": ("object", None),
}


def _normalize(name: str) -> str:
    normalized = re.sub(r"[^A-Za-z0-9_]", "_", name.replace("%", "percent"))
    if normalized[:1].isdigit():
        normalized = "_" + normalized
    return normalized


def _load_bim(path: str) -> Dict[str, Any]:
    lower = path.lower()
    if lower.endswith(".pbit"):
        try:
            with zipfile.ZipFile(path) as z:
                if "DataModelSchema" not in z.namelist():
                    raise ValueError(
                        f"'DataModelSchema' was not found inside '{path}'")
                raw = z.read("DataModelSchema")
        except zipfile.BadZipFile as e:
            raise ValueError(f"'{path}' is not a valid .pbit / ZIP file: {e}") from e
        try:
            return json.loads(raw.decode("utf-16"))
        except (UnicodeDecodeError, json.JSONDecodeError) as e:
            raise ValueError(f"Failed to parse DataModelSchema JSON: {e}") from e
    if lower.endswith((".bim", ".json")):
        with open(path, "r", encoding="utf-8-sig") as f:
            try:
                return json.load(f)
            except json.JSONDecodeError as e:
                raise ValueError(f"Failed to parse BIM JSON: {e}") from e
    raise ValueError(f"Unsupported file extension for '{path}'. "
                     "Supported formats: .pbit, .bim, .json")


def _infer_measure_type(format_string: str) -> str:
    if not format_string:
        return "number"
    fs = format_string.lower()
    if any(k in fs for k in ("yyyy", "mmm", "ddd", "hh:mm")):
        return "timestamp"
    if "true" in fs or "false" in fs:
        return "boolean"
    return "number"


def _expression_str(expr: Any) -> Optional[str]:
    if isinstance(expr, list):
        expr = "\n".join(expr)
    return expr.strip() if isinstance(expr, str) and expr.strip() else None


def _map_column(col: Dict[str, Any]) -> Optional[Property]:
    name = col.get("name", "")
    if not name:
        return None
    data_type = col.get("dataType", "string")
    is_calculated = col.get("columnType") == "calculated"
    # BIM writes camelCase type names (dataType: dateTime)
    logical, fmt = _PBI_TYPES.get(str(data_type).lower(), ("string", None))
    custom: Dict[str, Any] = {}
    for key in ("formatString", "displayFolder"):
        if col.get(key):
            custom[key] = col[key]
    if col.get("summarizeBy") not in ("none", "default", None):
        custom["summarizeBy"] = col["summarizeBy"]
    if col.get("isHidden"):
        custom["isHidden"] = True
    expr = _expression_str(col.get("expression"))
    if expr:
        custom["expression"] = expr
    options: Dict[str, Any] = {}
    if fmt:
        options["format"] = fmt
    if custom:
        options["customProperties"] = custom
    return Property(
        name=_normalize(name),
        logical_type=logical,
        physical_type="calculated column" if is_calculated else data_type,
        description=col.get("description") or None,
        required=not col.get("isNullable", True),
        options=options,
    )


def _map_measure(measure: Dict[str, Any]) -> Optional[Property]:
    name = measure.get("name", "")
    if not name:
        return None
    custom: Dict[str, Any] = {}
    if measure.get("isHidden"):
        custom["isHidden"] = True
    if measure.get("displayFolder"):
        custom["displayFolder"] = measure["displayFolder"]
    expr = _expression_str(measure.get("expression"))
    if expr:
        custom["expression"] = expr
    return Property(
        name=_normalize(name),
        logical_type=_infer_measure_type(measure.get("formatString", "")),
        physical_type="measure",
        description=measure.get("description") or None,
        options={"customProperties": custom} if custom else {},
    )


def _map_table(table: Dict[str, Any]) -> Optional[SchemaObject]:
    name = table.get("name", "")
    if not name or name.startswith(("LocalDateTable_", "DateTableTemplate_")):
        return None
    partitions = table.get("partitions", [])
    source_type = partitions[0].get("source", {}).get("type", "") if partitions else ""
    props: List[Property] = []
    for col in table.get("columns", []):
        if col.get("columnType") == "rowNumber":
            continue
        p = _map_column(col)
        if p is not None:
            props.append(p)
    for measure in table.get("measures", []):
        p = _map_measure(measure)
        if p is not None:
            props.append(p)
    return SchemaObject(
        name=_normalize(name),
        physical_name=name,
        physical_type="calculated table" if source_type == "calculated" else "table",
        description=table.get("description") or None,
        properties=props,
    )


def import_powerbi(bim: Dict[str, Any], model_name: str = "powerbi") -> DataContract:
    model = bim.get("model", bim)
    objects: List[SchemaObject] = []
    by_raw_name: Dict[str, SchemaObject] = {}
    for table in model.get("tables", []):
        obj = _map_table(table)
        if obj is not None:
            objects.append(obj)
            by_raw_name[table.get("name", "")] = obj
    # relationships attach on the many ('from') side
    for rel in model.get("relationships", []):
        from_obj = by_raw_name.get(rel.get("fromTable", ""))
        to_obj = by_raw_name.get(rel.get("toTable", ""))
        if from_obj is None or to_obj is None:
            continue
        from_col = _normalize(rel.get("fromColumn", ""))
        target = f"{_normalize(rel.get('toTable', ''))}.{_normalize(rel.get('toColumn', ''))}"
        for p in from_obj.properties:
            if p.name == from_col:
                custom = dict((p.options or {}).get("customProperties") or {})
                custom["references"] = target
                p.options = dict(p.options or {}, customProperties=custom)
                break
    objects.sort(key=lambda s: s.name.lower())
    return DataContract(
        id=model_name.lower().replace(" ", "-"),
        name=model_name,
        version="1.0.0",
        schema_objects=objects,
        servers=[Server(server="powerbi", type="custom", path=model_name)],
    )


def import_powerbi_file(path: str) -> DataContract:
    import os

    model_name = os.path.splitext(os.path.basename(path))[0]
    return import_powerbi(_load_bim(path), model_name=model_name)
