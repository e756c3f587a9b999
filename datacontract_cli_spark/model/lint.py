"""Contract document linting: JSON-Schema validation of the contract YAML
itself, before any data is touched.

The reference validates the parsed document against the published spec
schemas (datacontract-1.2.x / odcs-3.x) via jsonschema/fastjsonschema
(lint/resolve.py:441-466) and reports either the first error or, with
all_errors, every error sorted by document path. The spec schema files are
not vendored here; this is a hand-authored structural schema covering the
core surface those schemas enforce (required top-level fields, field types,
schema-object / property / server / SLA shapes), which rejects the same
classes of invalid documents (missing status/version, null descriptions,
wrong types) with reference-style messages.
"""

from __future__ import annotations

from typing import Any, Dict, List

import yaml

_STR = {"type": "string"}
_STR_MIN1 = {"type": "string", "minLength": 1}
_BOOL = {"type": "boolean"}

_ODCS_PROPERTY: Dict[str, Any] = {
    "type": "object",
    "required": ["name"],
    "properties": {
        "name": _STR_MIN1,
        "logicalType": _STR,
        "physicalType": _STR,
        "physicalName": _STR,
        "description": _STR,
        "businessName": _STR,
        "required": _BOOL,
        "unique": _BOOL,
        "primaryKey": _BOOL,
        "primaryKeyPosition": {"type": "integer"},
        "classification": _STR,
        "logicalTypeOptions": {"type": "object"},
        "tags": {"type": "array", "items": _STR},
        "quality": {"type": "array", "items": {"type": "object"}},
        "customProperties": {"type": "array", "items": {"type": "object"}},
        # properties/items are recursive; anchored via $ref below
        "properties": {"type": "array", "items": {"$ref": "#/definitions/property"}},
        "items": {"$ref": "#/definitions/property"},
        "examples": {"type": "array"},
        "transformLogic": _STR,
        "transformSourceObjects": {"type": "array"},
        "transformDescription": _STR,
        "criticalDataElement": _BOOL,
        "encryptedName": _STR,
        "partitioned": _BOOL,
        "partitionKeyPosition": {"type": "integer"},
        "expression": _STR,
    },
}

ODCS_SCHEMA: Dict[str, Any] = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "definitions": {"property": _ODCS_PROPERTY},
    "required": ["apiVersion", "kind", "id", "version", "status"],
    "properties": {
        "apiVersion": {"type": "string", "pattern": "^v?3\\."},
        "kind": {"type": "string", "enum": ["DataContract"]},
        "id": _STR_MIN1,
        "name": _STR,
        "version": _STR_MIN1,
        "status": _STR_MIN1,
        "tenant": _STR,
        "domain": _STR,
        "dataProduct": _STR,
        "tags": {"type": "array", "items": _STR},
        "description": {
            "type": "object",
            "properties": {
                "purpose": {"type": ["string", "null"]},
                "usage": {"type": ["string", "null"]},
                "limitations": {"type": ["string", "null"]},
            },
        },
        "schema": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["name"],
                "properties": {
                    "name": _STR_MIN1,
                    "physicalType": _STR,
                    "physicalName": _STR,
                    "logicalType": _STR,
                    "description": _STR,
                    "businessName": _STR,
                    "dataGranularityDescription": _STR,
                    "tags": {"type": "array", "items": _STR},
                    "properties": {"type": "array",
                                   "items": {"$ref": "#/definitions/property"}},
                    "quality": {"type": "array", "items": {"type": "object"}},
                },
            },
        },
        "servers": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["server", "type"],
                "properties": {"server": _STR_MIN1, "type": _STR_MIN1},
            },
        },
        "slaProperties": {
            "type": "array",
            "items": {
                "type": "object",
                "required": ["property"],
                "properties": {"property": _STR_MIN1, "element": _STR,
                               "unit": _STR},
            },
        },
        "team": {"type": ["array", "object"]},
        "roles": {"type": "array"},
        "support": {"type": "array"},
        "price": {"type": "object"},
        "slaDefaultElement": _STR,
        "contractCreatedTs": {},
        "customProperties": {"type": "array", "items": {"type": "object"}},
        "authoritativeDefinitions": {"type": "array"},
    },
}

DCS_SCHEMA: Dict[str, Any] = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["dataContractSpecification", "id", "info"],
    "properties": {
        "dataContractSpecification": {"type": ["string", "number"]},
        "id": _STR_MIN1,
        "info": {
            "type": "object",
            "required": ["title", "version"],
            "properties": {"title": _STR_MIN1, "version": _STR_MIN1},
        },
        "servers": {"type": "object"},
        "models": {"type": "object"},
        "terms": {"type": "object"},
        "servicelevels": {"type": "object"},
        "definitions": {"type": "object"},
        "examples": {"type": "array"},
        "quality": {"type": "object"},
        "tags": {"type": "array"},
        "links": {"type": "object"},
    },
}


def _error_path(err) -> str:
    return ".".join(str(p) for p in err.absolute_path)


def lint_document(doc: Dict[str, Any], all_errors: bool = True) -> List[str]:
    """Validate a parsed contract document; [] when valid, else messages
    sorted by document path (reference lint/resolve.py:445-455)."""
    import jsonschema

    if not isinstance(doc, dict):
        return ["contract YAML must be a mapping"]
    schema = DCS_SCHEMA if ("models" in doc or "dataContractSpecification" in doc) \
        and "schema" not in doc else ODCS_SCHEMA
    validator = jsonschema.Draft7Validator(schema)
    errors = sorted(validator.iter_errors(doc), key=lambda e: list(e.absolute_path))
    msgs = []
    for e in errors:
        path = _error_path(e)
        msgs.append(f"{path}: {e.message}" if path else e.message)
        if not all_errors:
            break
    return msgs


def lint_str(text: str, all_errors: bool = True) -> List[str]:
    try:
        doc = yaml.safe_load(text)
    except yaml.YAMLError as e:
        return [f"invalid YAML: {e}"]
    return lint_document(doc, all_errors=all_errors)


def lint_file(path: str, all_errors: bool = True) -> List[str]:
    with open(path, "r", encoding="utf-8") as f:
        return lint_str(f.read(), all_errors=all_errors)
