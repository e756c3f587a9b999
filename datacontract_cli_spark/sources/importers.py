"""Contract importers: derive a DataContract from existing data or schemas.

Covers the Spark-relevant subset of the reference's imports/ surface:
parquet/csv/json files reflect through a Spark schema read
(parquet_importer.py / csv_importer.py / json_importer.py), Avro schemas
and draft-07 JSON Schemas convert structurally (avro_importer.py /
jsonschema_importer.py — here as the exact inverses of our exporters).
"""

from __future__ import annotations

import json
from typing import Any, Dict, Optional

from pyspark.sql import SparkSession

from datacontract_cli_spark.checks.types import spark_type_to_property
from datacontract_cli_spark.model.contract import DataContract, Property, SchemaObject


def _from_df_schema(schema, name: str, contract_id: Optional[str],
                    fmt: str, path: str) -> DataContract:
    from datacontract_cli_spark.model.contract import Server

    props = [spark_type_to_property(f.name, f.dataType) for f in schema.fields]
    for prop, field in zip(props, schema.fields):
        prop.required = not field.nullable
    return DataContract(
        id=contract_id or name,
        version="0.0.1",
        schema_objects=[SchemaObject(name=name, properties=props)],
        servers=[Server(server="local", type="local", format=fmt, path=path)],
    )


def import_file(spark: SparkSession, path: str, fmt: str, name: str,
                contract_id: Optional[str] = None) -> DataContract:
    """Reflect a parquet/orc/csv/json file's (inferred) schema into a
    contract. CSV/JSON use schema inference, like the reference importers."""
    fmt = fmt.lower()
    if fmt == "parquet":
        df = spark.read.parquet(path)
    elif fmt == "orc":
        df = spark.read.orc(path)
    elif fmt == "csv":
        df = spark.read.option("header", "true").option("inferSchema", "true").csv(path)
    elif fmt in ("json", "jsonl", "ndjson"):
        df = spark.read.json(path)
    else:
        raise ValueError(f"unsupported import format: {fmt}")
    return _from_df_schema(df.schema, name, contract_id, fmt, path)


# ---------------------------------------------------------------------------
# Avro schema -> contract (inverse of export.to_avro_schema)
# ---------------------------------------------------------------------------

_AVRO_TO_LOGICAL = {
    "string": "string", "int": "integer", "long": "integer",
    "float": "number", "double": "number", "boolean": "boolean",
    "bytes": "bytes",
}
_AVRO_LOGICAL = {
    "date": "date", "timestamp-millis": "timestamp",
    "timestamp-micros": "timestamp", "local-timestamp-millis": "timestamp_ntz",
    "local-timestamp-micros": "timestamp_ntz", "decimal": "number",
}


def _avro_to_property(name: str, t: Any) -> Property:
    required = True
    if isinstance(t, list):  # union: ["null", T] => optional
        non_null = [x for x in t if x != "null"]
        required = len(non_null) == len(t)
        t = non_null[0] if non_null else "string"
    if isinstance(t, dict):
        at = t.get("type")
        lt = t.get("logicalType")
        if lt in _AVRO_LOGICAL:
            return Property(name=name, logical_type=_AVRO_LOGICAL[lt], required=required)
        if at == "record":
            return Property(
                name=name, logical_type="object", required=required,
                properties=[_avro_to_property(f["name"], f["type"])
                            for f in t.get("fields", [])],
            )
        if at == "array":
            return Property(name=name, logical_type="array", required=required,
                            items=_avro_to_property("items", t.get("items", "string")))
        if at == "enum":
            p = Property(name=name, logical_type="string", required=required)
            p.options["enum"] = list(t.get("symbols", []))
            return p
        t = at
    return Property(name=name, logical_type=_AVRO_TO_LOGICAL.get(t, "string"),
                    required=required)


def import_avro_schema(schema: Any, contract_id: Optional[str] = None) -> DataContract:
    """Avro record schema (dict, JSON string, or .avsc path) -> contract."""
    if isinstance(schema, str):
        if schema.lstrip().startswith("{"):
            schema = json.loads(schema)
        else:
            with open(schema, "r", encoding="utf-8") as f:
                schema = json.load(f)
    records = schema if isinstance(schema, list) else [schema]
    objs = []
    for rec in records:
        if rec.get("type") != "record":
            raise ValueError("avro import expects a record schema")
        props = [_avro_to_property(f["name"], f["type"]) for f in rec.get("fields", [])]
        objs.append(SchemaObject(name=rec.get("name") or "model", properties=props))
    return DataContract(id=contract_id or objs[0].name, version="0.0.1",
                        schema_objects=objs)


# ---------------------------------------------------------------------------
# JSON Schema -> contract (inverse of operators.jsonschema exporter)
# ---------------------------------------------------------------------------

_JSON_TO_LOGICAL = {
    "string": "string", "integer": "integer", "number": "number",
    "boolean": "boolean", "object": "object", "array": "array",
}
_JSON_FORMAT_TO_LOGICAL = {"date-time": "timestamp", "date": "date", "time": "time"}
_KEYWORDS = ("pattern", "minLength", "maxLength", "minimum", "maximum",
             "exclusiveMinimum", "exclusiveMaximum", "enum", "format")


def _jsonschema_to_property(name: str, schema: Dict[str, Any],
                            required: bool) -> Property:
    jt = schema.get("type")
    if isinstance(jt, list):
        non_null = [t for t in jt if t != "null"]
        jt = non_null[0] if non_null else "string"
    fmt = schema.get("format")
    logical = _JSON_FORMAT_TO_LOGICAL.get(fmt) or _JSON_TO_LOGICAL.get(jt, "string")
    prop = Property(name=name, logical_type=logical, required=required)
    for key in _KEYWORDS:
        if key in schema and key != "format":
            prop.options[key] = schema[key]
    if logical == "object":
        req = set(schema.get("required") or [])
        children = schema.get("properties") or schema.get("patternProperties") or {}
        prop.properties = [_jsonschema_to_property(k, v, k in req)
                           for k, v in children.items()] or None
    if logical == "array" and isinstance(schema.get("items"), dict):
        prop.items = _jsonschema_to_property("items", schema["items"], True)
    return prop


def import_jsonschema(schema: Any, name: str = "model",
                      contract_id: Optional[str] = None) -> DataContract:
    """Draft-07 object schema (dict, JSON string, or path) -> contract."""
    if isinstance(schema, str):
        if schema.lstrip().startswith("{"):
            schema = json.loads(schema)
        else:
            with open(schema, "r", encoding="utf-8") as f:
                schema = json.load(f)
    req = set(schema.get("required") or [])
    props = [_jsonschema_to_property(k, v, k in req)
             for k, v in (schema.get("properties") or {}).items()]
    return DataContract(
        id=contract_id or schema.get("title") or name,
        version="0.0.1",
        schema_objects=[SchemaObject(name=schema.get("title") or name,
                                     properties=props)],
    )
