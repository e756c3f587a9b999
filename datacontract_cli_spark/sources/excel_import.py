"""Excel contract-template importer (reference imports/excel_importer.py,
there via openpyxl — absent from this image, so the workbook is read with
the stdlib SpreadsheetML reader in sources/xlsx.py).

Covered template surface: the Fundamentals named cells (apiVersion, kind,
id, name, version, status, domain, dataProduct, tenant, tags,
description.purpose/limitations/usage), one schema object per
``Schema <name>`` sheet (named cells schema.name/physicalName/physicalType/
description/businessName/dataGranularityDescription/tags plus the
``schema.properties`` table: header-mapped columns, dotted-name nesting
with array items, logicalTypeOptions, examples, tags, authoritative
definitions), horizontally-stacked servers with type-specific named rows,
and the SLA properties table. The reference's support/team/roles/pricing/
custom-properties sheets carry fields outside this engine's contract model
and are skipped."""

from __future__ import annotations

from typing import Any, Dict, List, Optional

from datacontract_cli_spark.model.contract import (
    DataContract,
    Property,
    SchemaObject,
    Server,
    SLAProperty,
)
from datacontract_cli_spark.sources.xlsx import XlsxWorkbook


def _s(v) -> Optional[str]:
    if v is None:
        return None
    s = str(v).strip()
    return s or None


def _b(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).strip().lower() in ("true", "yes", "1") if v is not None else False


def _i(v) -> Optional[int]:
    try:
        return int(float(v)) if v is not None and str(v).strip() != "" else None
    except (TypeError, ValueError):
        return None


def _csv_list(v) -> Optional[List[str]]:
    s = _s(v)
    if not s:
        return None
    return [x.strip() for x in s.split(",") if x.strip()]


_LTO_HEADERS = {
    "minimum length": ("minLength", _i),
    "maximum length": ("maxLength", _i),
    "pattern": ("pattern", _s),
    "format": ("format", _s),
    "exclusive maximum": ("exclusiveMaximum", _b),
    "exclusive minimum": ("exclusiveMinimum", _b),
    "minimum": ("minimum", lambda v: v),
    "maximum": ("maximum", lambda v: v),
    "multiple of": ("multipleOf", lambda v: v),
    "minimum items": ("minItems", _i),
    "maximum items": ("maxItems", _i),
    "unique items": ("uniqueItems", _b),
    "maximum properties": ("maxProperties", _i),
    "minimum properties": ("minProperties", _i),
}


def _sheet_headers(sheet, header_row: int) -> Dict[str, int]:
    headers: Dict[str, int] = {}
    for col in range(1, 100):
        v = sheet.value(header_row, col)
        if v is not None:
            headers[str(v).strip().lower()] = col
    return headers


def _import_properties(wb: XlsxWorkbook, sheet_name: str) -> List[Property]:
    rng = wb.range_rows_by_name("schema.properties", sheet_name)
    sheet = wb.sheet(sheet_name)
    if rng is None or sheet is None:
        return []
    _, start_row, end_row = rng
    headers = _sheet_headers(sheet, start_row)
    end_row = min(end_row, sheet.max_row)

    def cell(row: int, header: str):
        col = headers.get(header)
        return sheet.value(row, col) if col else None

    lookup: Dict[str, Property] = {}
    order: List[str] = []
    for row in range(start_row + 1, end_row + 1):
        name = _s(cell(row, "property"))
        if not name:
            continue
        options: Dict[str, Any] = {}
        for header, (key, conv) in _LTO_HEADERS.items():
            raw = cell(row, header)
            if raw is not None and str(raw).strip() != "":
                val = conv(raw)
                if val is not None and val is not False:
                    options[key] = val
        req_props = _csv_list(cell(row, "required properties"))
        if req_props:
            options["required"] = req_props
        custom: Dict[str, Any] = {}
        for header, key in (("business name", "businessName"),
                            ("encrypted name", "encryptedName"),
                            ("transform logic\t", "transformLogic"),
                            ("transform logic", "transformLogic"),
                            ("transform description", "transformDescription")):
            v = _s(cell(row, header))
            if v and key not in custom:
                custom[key] = v
        auth_url = _s(cell(row, "authoritative definition url"))
        auth_type = _s(cell(row, "authoritative definition type"))
        if auth_url and auth_type:
            custom["authoritativeDefinitionUrl"] = auth_url
            custom["authoritativeDefinitionType"] = auth_type
        examples = _csv_list(cell(row, "example(s)"))
        if examples:
            custom["examples"] = examples
        if custom:
            options["customProperties"] = custom
        prop = Property(
            name=name,
            logical_type=_s(cell(row, "logical type")),
            physical_type=_s(cell(row, "physical type")),
            physical_name=_s(cell(row, "physical name")),
            description=_s(cell(row, "description")),
            required=_b(cell(row, "required")),
            unique=_b(cell(row, "unique")),
            primary_key=_b(cell(row, "primary key")),
            primary_key_position=_i(cell(row, "primary key position")),
            classification=_s(cell(row, "classification")),
            tags=_csv_list(cell(row, "tags")),
            options=options,
        )
        lookup[name] = prop
        order.append(name)

    roots: List[Property] = []
    for name in order:
        prop = lookup[name]
        if "." in name:
            parent_name, _, child = name.rpartition(".")
            parent = lookup.get(parent_name)
            if parent is not None:
                prop.name = child
                if (parent.logical_type or "").lower() == "array":
                    parent.items = prop
                else:
                    parent.properties = (parent.properties or [])
                    parent.properties.append(prop)
                continue
        roots.append(prop)
    return roots


def _import_schemas(wb: XlsxWorkbook) -> List[SchemaObject]:
    objects = []
    for sheet_name in wb.sheetnames:
        if not sheet_name.startswith("Schema ") or sheet_name == "Schema <table_name>":
            continue
        name = _s(wb.value_by_name("schema.name", sheet_name))
        if not name:
            continue
        obj = SchemaObject(
            name=name,
            logical_type="object",
            physical_type=_s(wb.value_by_name("schema.physicalType", sheet_name)),
            physical_name=_s(wb.value_by_name("schema.physicalName", sheet_name)),
            description=_s(wb.value_by_name("schema.description", sheet_name)),
            properties=_import_properties(wb, sheet_name),
        )
        objects.append(obj)
    return objects


def _import_servers(wb: XlsxWorkbook) -> List[Server]:
    anchor = wb.cell_by_name("servers.server")
    sheet = wb.sheet("Servers")
    if anchor is None or sheet is None:
        return []
    _, row, col = anchor
    # per-type field rows, discovered from the defined names themselves
    type_fields: Dict[str, Dict[str, int]] = {}
    common_rows: Dict[str, int] = {}
    for (name, _scope), _ref in wb.defined_names.items():
        if not name.startswith("servers."):
            continue
        cell = wb.cell_by_name(name)
        if cell is None:
            continue
        parts = name.split(".")
        if len(parts) == 2:
            common_rows[parts[1]] = cell[1]
        elif len(parts) == 3:
            type_fields.setdefault(parts[1], {})[parts[2]] = cell[1]

    servers: List[Server] = []
    offset = 0
    while True:
        server_name = _s(sheet.value(row, col + offset))
        if not server_name:
            break
        stype = _s(sheet.value(common_rows.get("type", row), col + offset))
        options: Dict[str, Any] = {}
        for key in ("description", "environment"):
            v = _s(sheet.value(common_rows.get(key, 0), col + offset)) \
                if key in common_rows else None
            if v:
                options[key] = v
        fields = type_fields.get(stype or "", type_fields.get("custom", {}))
        known: Dict[str, Any] = {}
        for fname, frow in fields.items():
            v = sheet.value(frow, col + offset)
            if v is None or str(v).strip() == "":
                continue
            if fname in ("catalog",):
                known["catalog"] = _s(v)
            elif fname in ("schema",):
                known["schema_"] = _s(v)
            elif fname in ("format",):
                known["format"] = _s(v)
            elif fname in ("location", "path"):
                known.setdefault("location" if fname == "location" else "path", _s(v))
            elif fname == "port":
                options[fname] = _i(v)
            else:
                options[fname] = _s(v)
        servers.append(Server(server=server_name, type=stype,
                              options=options, **known))
        offset += 1
    return servers


def _import_slas(wb: XlsxWorkbook) -> List[SLAProperty]:
    rng = wb.range_rows_by_name("slaProperties", "SLA")
    sheet = wb.sheet("SLA")
    if rng is None or sheet is None:
        return []
    _, start_row, end_row = rng
    headers = _sheet_headers(sheet, start_row)
    end_row = min(end_row, sheet.max_row)
    out: List[SLAProperty] = []
    for row in range(start_row + 1, end_row + 1):
        prop = _s(sheet.value(row, headers.get("property", 0)))
        if not prop:
            continue
        out.append(SLAProperty(
            property=prop,
            value=sheet.value(row, headers.get("value", 0)),
            unit=_s(sheet.value(row, headers.get("unit", 0))),
            element=_s(sheet.value(row, headers.get("element", 0))),
        ))
    return out


def import_excel(path: str) -> DataContract:
    wb = XlsxWorkbook(path)
    desc = wb.value_by_name("description.purpose")
    return DataContract(
        id=_s(wb.value_by_name("id")),
        name=_s(wb.value_by_name("name")),
        version=_s(wb.value_by_name("version")),
        description=_s(desc),
        schema_objects=_import_schemas(wb),
        servers=_import_servers(wb),
        sla_properties=_import_slas(wb),
    )
