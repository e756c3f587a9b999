"""Contract importers: derive a DataContract from existing data or schemas.

Covers the Spark-relevant subset of the reference's imports/ surface:
parquet/csv/json files reflect through a Spark schema read
(parquet_importer.py / csv_importer.py / json_importer.py), Avro schemas
and draft-07 JSON Schemas convert structurally (avro_importer.py /
jsonschema_importer.py — here as the exact inverses of our exporters).
"""

from __future__ import annotations

import json
import re
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


def import_spark(spark: SparkSession, source: Optional[str] = None,
                 dataframe: Optional[Any] = None,
                 description: Optional[str] = None,
                 contract_id: Optional[str] = None) -> DataContract:
    """Live-session Spark importer (reference imports/spark_importer.py:
    33-90): reflect a DataFrame, or a comma-separated list of tables /
    temp views visible in the shared SparkSession, into a contract with a
    ``dataframe`` server. Field comments come from StructField metadata;
    a table's catalog comment becomes the schema description when no
    explicit description is given. Pure metadata — no data is scanned."""
    from datacontract_cli_spark.model.contract import Server

    def _schema_object(name: str, df) -> SchemaObject:
        props = [spark_type_to_property(f.name, f.dataType)
                 for f in df.schema.fields]
        for prop, field in zip(props, df.schema.fields):
            prop.required = not field.nullable
            comment = (field.metadata or {}).get("comment")
            if comment and not prop.description:
                prop.description = comment
        desc = description
        if desc is None:
            try:
                desc = spark.catalog.getTable(name).description or None
            except Exception:
                desc = None  # plain DataFrame / temp view: no catalog entry
        return SchemaObject(name=name, physical_type="table",
                            description=desc, properties=props)

    objects = []
    if dataframe is not None:
        from pyspark.sql import DataFrame as _DF
        if not isinstance(dataframe, _DF):
            raise TypeError("expected 'dataframe' to be a pyspark.sql.DataFrame")
        objects.append(_schema_object(source or "model", dataframe))
    else:
        if not source:
            raise ValueError("either 'dataframe' or a table/view name in "
                             "'source' must be provided")
        for table_name in map(str.strip, source.split(",")):
            objects.append(_schema_object(table_name,
                                          spark.read.table(table_name)))
    return DataContract(
        id=contract_id or (objects[0].name if objects else "contract"),
        version="0.0.1",
        schema_objects=objects,
        servers=[Server(server="local", type="dataframe")],
    )


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
    prop = Property(name=name, logical_type=logical, required=required,
                    business_name=schema.get("title"),
                    description=schema.get("description"))
    for key in _KEYWORDS:
        if key in schema and key != "format":
            prop.options[key] = schema[key]
    # unmapped formats (email, uri, uuid...) survive as an option so the
    # jsonschema exporter round-trips them; mapped formats (date-time,
    # date, time) are captured by the logical type itself
    if fmt is not None and fmt not in _JSON_FORMAT_TO_LOGICAL:
        prop.options["format"] = fmt
    if logical == "object":
        req = set(schema.get("required") or [])
        children = schema.get("properties") or schema.get("patternProperties") or {}
        prop.properties = [_jsonschema_to_property(k, v, k in req)
                           for k, v in children.items()] or None
    if logical == "array" and isinstance(schema.get("items"), dict):
        items_type = schema["items"].get("type")
        items_required = not (isinstance(items_type, list)
                              and "null" in items_type)
        prop.items = _jsonschema_to_property("items", schema["items"],
                                             items_required)
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
                                     business_name=schema.get("title"),
                                     description=schema.get("description"),
                                     properties=props)],
    )


# ---------------------------------------------------------------------------
# dbt manifest -> contract (reference imports/dbt_importer.py)
# ---------------------------------------------------------------------------

_DBT_TYPE_MAP = {
    "string": "string", "varchar": "string", "text": "string", "char": "string",
    "int": "integer", "integer": "integer", "bigint": "integer",
    "smallint": "integer",
    "float": "number", "double": "number", "decimal": "number",
    "numeric": "number",
    "boolean": "boolean", "bool": "boolean",
    # the reference maps datetime/timestamp to "date" for non-bigquery
    # adapters (dbt_importer.py:287-291) — kept for parity
    "date": "date", "datetime": "date", "timestamp": "date",
    "time": "string",
    "array": "array", "object": "object", "struct": "object", "json": "object",
}

_BQ_TYPE_MAP = {
    "STRING": "string", "BYTES": "array", "INTEGER": "integer",
    "INT64": "integer", "FLOAT": "number", "FLOAT64": "number",
    "BOOLEAN": "boolean", "BOOL": "boolean", "TIMESTAMP": "timestamp",
    "DATE": "date", "TIME": "time", "DATETIME": "timestamp",
    "NUMERIC": "number", "BIGNUMERIC": "number", "GEOGRAPHY": "object",
    "JSON": "object", "INTERVAL": "string",
}


def _dbt_logical_type(data_type: Optional[str], adapter_type: Optional[str]) -> str:
    if not data_type:
        return "string"
    if adapter_type == "bigquery":
        mapped = _BQ_TYPE_MAP.get(data_type.upper())
        if mapped is None:
            raise ValueError(f"Unsupported type {data_type} in bigquery definition.")
        return mapped
    lowered = data_type.lower()
    for key, value in _DBT_TYPE_MAP.items():
        if lowered.startswith(key):
            return value
    return "string"


def _dbt_attached_tests(manifest: Dict[str, Any], model_uid: str):
    """Generic test nodes attached to a model, skipping conditional (where)
    tests (reference _iter_attached_tests)."""
    nodes = manifest.get("nodes") or {}
    for child_id in (manifest.get("child_map") or {}).get(model_uid, []):
        child = nodes.get(child_id)
        if not child or child.get("resource_type") != "test":
            continue
        if child.get("test_metadata") is None:
            continue
        if (child.get("config") or {}).get("where") is not None:
            continue
        yield child


def _dbt_primary_keys(manifest: Dict[str, Any], node: Dict[str, Any]) -> list:
    """dbt ModelNode.infer_primary_key precedence: model constraint > column
    constraint > unique+not_null tests > enabled unique > disabled unique."""
    if node.get("resource_type") != "model":
        return []
    for c in node.get("constraints") or []:
        if c.get("type") == "primary_key" and c.get("columns"):
            return list(c["columns"])
    for col_name, col in (node.get("columns") or {}).items():
        if any(c.get("type") == "primary_key" for c in col.get("constraints") or []):
            return [col_name]
    enabled, disabled, not_null = set(), set(), set()
    for t in _dbt_attached_tests(manifest, node["unique_id"]):
        meta = t.get("test_metadata") or {}
        kwargs = meta.get("kwargs") or {}
        cols = ([kwargs["column_name"]] if isinstance(kwargs.get("column_name"), str)
                else [c for c in kwargs.get("combination_of_columns") or []
                      if isinstance(c, str)])
        if not cols:
            continue
        if meta.get("name") in ("unique", "unique_combination_of_columns"):
            target = enabled if (t.get("config") or {}).get("enabled", True) else disabled
            target.update(cols)
        elif meta.get("name") == "not_null":
            not_null.update(cols)
    both = [c for c in not_null if c in enabled or c in disabled]
    if both:
        return both
    return list(enabled) or list(disabled)


def import_dbt_manifest(manifest: Dict[str, Any],
                        dbt_nodes: Optional[list] = None,
                        resource_types: Optional[list] = None) -> DataContract:
    """dbt manifest.json -> contract: one schema object per model node with
    column types (adapter-aware), required/unique from tests AND constraints,
    inferred primary keys, descriptions and tags."""
    resource_types = resource_types or ["model"]
    metadata = manifest.get("metadata") or {}
    project = metadata.get("project_name")
    adapter = metadata.get("adapter_type")
    objects = []
    for node in (manifest.get("nodes") or {}).values():
        if node.get("resource_type") not in resource_types:
            continue
        if dbt_nodes and node.get("name") not in dbt_nodes:
            continue
        uid = node["unique_id"]
        pks = _dbt_primary_keys(manifest, node)
        single_pk = pks[0] if len(pks) == 1 else None
        # foreign keys from relationships tests -> customProperties.references
        references: Dict[str, str] = {}
        all_nodes = manifest.get("nodes") or {}
        for t in _dbt_attached_tests(manifest, uid):
            meta = t.get("test_metadata") or {}
            if meta.get("name") != "relationships" or t.get("attached_node") != uid:
                continue
            targets = [n for n in (t.get("depends_on") or {}).get("nodes") or []
                       if n != uid]
            target = all_nodes.get(targets[0]) if targets else None
            col, fld = t.get("column_name"), (meta.get("kwargs") or {}).get("field")
            if target and col and fld:
                references[col] = f"{target['name']}.{fld}"
        tests_by_col: Dict[str, set] = {}
        for t in _dbt_attached_tests(manifest, uid):
            col = t.get("column_name")
            if col:
                tests_by_col.setdefault(col, set()).add(
                    (t.get("test_metadata") or {}).get("name"))
        props = []
        for col in (node.get("columns") or {}).values():
            name = col.get("name")
            constraints = {c.get("type") for c in col.get("constraints") or []}
            tests = tests_by_col.get(name, set())
            options = ({"customProperties": {"references": references[name]}}
                       if name in references else {})
            props.append(Property(
                name=name,
                logical_type=_dbt_logical_type(col.get("data_type"), adapter),
                physical_type=col.get("data_type"),
                description=col.get("description") or None,
                required="not_null" in constraints | tests,
                unique="unique" in constraints | tests,
                primary_key=name == single_pk,
                primary_key_position=1 if name == single_pk else None,
                options=options,
            ))
        obj = SchemaObject(
            name=node.get("name"),
            physical_name=node.get("name"),
            physical_type=(node.get("config") or {}).get("materialized"),
            description=node.get("description") or None,
            properties=props,
        )
        objects.append(obj)
    return DataContract(
        id=(project.lower().replace(" ", "-") if project else "my-data-contract"),
        name=project,
        version="1.0.0",
        schema_objects=objects,
    )


def import_dbt_manifest_file(path: str, **kwargs) -> DataContract:
    with open(path, "r", encoding="utf-8") as f:
        return import_dbt_manifest(json.load(f), **kwargs)


# ---------------------------------------------------------------------------
# BigQuery table JSON -> contract (reference imports/bigquery_importer.py)
# ---------------------------------------------------------------------------

def _bq_property(field: Dict[str, Any]) -> Property:
    name = field.get("name")
    required = field.get("mode") == "REQUIRED"
    repeated = field.get("mode") == "REPEATED"
    ftype = field.get("type")
    description = field.get("description")
    if ftype in ("RECORD", "STRUCT"):
        nested = [_bq_property(f) for f in field.get("fields", [])]
        if repeated:
            return Property(name=name, logical_type="array", description=description,
                            items=Property(name="items", logical_type="object",
                                           physical_type=ftype, properties=nested))
        return Property(name=name, logical_type="object", physical_type=ftype,
                        description=description, required=required,
                        properties=nested)
    if ftype == "RANGE":
        # range of date/datetime/timestamp — multiple values, maps to array
        elem = field.get("rangeElementType", {}).get("type", "STRING")
        return Property(name=name, logical_type="array", physical_type="RANGE",
                        description=description, required=required,
                        items=Property(name="items",
                                       logical_type=_BQ_TYPE_MAP.get(elem, "string"),
                                       physical_type=elem))
    logical = _BQ_TYPE_MAP.get(ftype)
    if logical is None:
        raise ValueError(f"Unsupported type {ftype} in bigquery json definition.")
    opts: Dict[str, Any] = {}
    if ftype == "STRING" and field.get("maxLength") is not None:
        opts["maxLength"] = int(field["maxLength"])
    if ftype in ("NUMERIC", "BIGNUMERIC"):
        custom = {}
        if field.get("precision") is not None:
            custom["precision"] = int(field["precision"])
        if field.get("scale") is not None:
            custom["scale"] = int(field["scale"])
        if custom:
            opts["customProperties"] = custom
    if repeated:
        return Property(name=name, logical_type="array", description=description,
                        items=Property(name="items", logical_type=logical,
                                       physical_type=ftype, options=opts))
    return Property(name=name, logical_type=logical, physical_type=ftype,
                    description=description, required=required, options=opts)


def import_bigquery_json(doc: Dict[str, Any]) -> DataContract:
    """BigQuery tables.get JSON -> contract (table type TABLE/EXTERNAL/
    SNAPSHOT -> table, VIEW/MATERIALIZED_VIEW -> view)."""
    ref = doc.get("tableReference", {})
    bq_type = doc.get("type", "TABLE")
    physical = "view" if bq_type in ("VIEW", "MATERIALIZED_VIEW") else "table"
    obj = SchemaObject(
        name=ref.get("tableId", "unknown"),
        physical_type=physical,
        description=doc.get("description"),
        properties=[_bq_property(f)
                    for f in doc.get("schema", {}).get("fields", [])],
    )
    from datacontract_cli_spark.model.contract import Server
    servers = []
    if ref.get("projectId") and ref.get("datasetId"):
        servers = [Server(server="bigquery", type="bigquery",
                          options={"project": ref["projectId"],
                                   "dataset": ref["datasetId"]})]
    return DataContract(id="my-data-contract", version="1.0.0",
                        schema_objects=[obj], servers=servers)


def import_bigquery_json_file(path: str) -> DataContract:
    with open(path, "r", encoding="utf-8") as f:
        return import_bigquery_json(json.load(f))


# ---------------------------------------------------------------------------
# Unity Catalog table JSON -> contract (reference imports/unity_importer.py)
# ---------------------------------------------------------------------------

def import_unity_json(doc: Dict[str, Any]) -> DataContract:
    """Unity TableInfo JSON -> contract. type_json carries each column's
    full Spark StructField JSON — parsed with Spark's own type machinery and
    reflected through the same spark_type_to_property walk the parquet
    importer uses (genuinely Spark-native, unlike the reference's bespoke
    JSON walker)."""
    from pyspark.sql import types as T

    from datacontract_cli_spark.sources.sql_ddl import map_type_from_sql

    props = []
    for col in doc.get("columns") or []:
        sql_type = str(col.get("type_text") or "string")
        logical, fmt = map_type_from_sql(sql_type)
        required = not col.get("nullable", True)
        prop = None
        type_json = col.get("type_json")
        if type_json:
            try:
                field = T.StructField.fromJson(json.loads(type_json))
                prop = spark_type_to_property(col.get("name"), field.dataType)
            except Exception:
                prop = None
        if prop is None:
            prop = Property(name=col.get("name"), logical_type=logical)
        prop.physical_type = sql_type
        prop.required = required
        prop.description = col.get("comment")
        if fmt and prop.logical_type == "string":
            prop.options = dict(prop.options or {}, format=fmt)
        props.append(prop)
    obj = SchemaObject(
        name=doc.get("name") or doc.get("table_id") or "unknown",
        physical_type="table",
        description=doc.get("comment"),
        properties=props,
    )
    from datacontract_cli_spark.model.contract import Server
    servers = []
    if doc.get("catalog_name") and doc.get("schema_name"):
        servers = [Server(server="databricks", type="databricks",
                          catalog=doc["catalog_name"], schema_=doc["schema_name"])]
    return DataContract(id="my-data-contract", version="1.0.0",
                        schema_objects=[obj], servers=servers)


def import_unity_json_file(path: str) -> DataContract:
    with open(path, "r", encoding="utf-8") as f:
        return import_unity_json(json.load(f))


# ---------------------------------------------------------------------------
# Iceberg schema JSON -> contract (reference imports/iceberg_importer.py —
# the pyiceberg Schema model parsed directly from its JSON wire form, so no
# pyiceberg runtime is needed; identifier-field-ids become primary keys)
# ---------------------------------------------------------------------------

_ICEBERG_PRIMITIVES = {
    "boolean": "boolean", "int": "integer", "long": "integer",
    "float": "number", "double": "number", "date": "date",
    "time": "string", "timestamp": "date", "timestamptz": "date",
    "string": "string", "uuid": "string", "binary": "array",
}


def _iceberg_logical(t: Any) -> str:
    if isinstance(t, str):
        if t.startswith("decimal"):
            return "number"
        if t.startswith("fixed"):
            return "array"
        mapped = _ICEBERG_PRIMITIVES.get(t)
        if mapped is None:
            raise ValueError(f"Unknown Iceberg type: {t}")
        return mapped
    kind = t.get("type")
    if kind == "struct":
        return "object"
    if kind == "list":
        return "array"
    if kind == "map":
        return "object"
    raise ValueError(f"Unknown Iceberg type: {t}")


def _iceberg_physical(t: Any) -> str:
    if isinstance(t, str):
        return t
    kind = t.get("type")
    if kind == "list":
        return f"list<{_iceberg_physical(t['element'])}>"
    if kind == "map":
        return "map"
    if kind == "struct":
        inner = ", ".join(f"{f['name']}: {_iceberg_physical(f['type'])}"
                          for f in t.get("fields", []))
        return f"struct<{inner}>"
    return str(t)


def _iceberg_type_to_property(name: str, t: Any, required: bool,
                              field_id: Optional[int] = None,
                              doc: Optional[str] = None) -> Property:
    logical = _iceberg_logical(t)
    custom: Dict[str, Any] = {}
    if field_id is not None and field_id > 0:
        custom["icebergFieldId"] = field_id
    nested = None
    items = None
    physical = _iceberg_physical(t)
    if isinstance(t, dict) and t.get("type") == "list":
        items = _iceberg_type_to_property(
            "items", t["element"], bool(t.get("element-required", True)))
    elif isinstance(t, dict) and t.get("type") == "map":
        custom["mapKeyType"] = _iceberg_logical(t["key"])
        custom["mapValueType"] = _iceberg_logical(t["value"])
        custom["mapValueRequired"] = str(bool(t.get("value-required", True))).lower()
        if isinstance(t["value"], dict) and t["value"].get("type") == "map":
            v = t["value"]
            custom["mapValuePhysicalType"] = "map"
            custom["mapNestedKeyType"] = _iceberg_logical(v["key"])
            custom["mapNestedValueType"] = _iceberg_logical(v["value"])
            custom["mapNestedValueRequired"] = str(bool(v.get("value-required", True))).lower()
    elif isinstance(t, dict) and t.get("type") == "struct":
        nested = [_iceberg_type_to_property(
            f["name"], f["type"], bool(f.get("required", False)),
            f.get("id"), f.get("doc")) for f in t.get("fields", [])]
    return Property(
        name=name,
        logical_type=logical,
        physical_type=physical,
        description=doc,
        required=required,
        properties=nested,
        items=items,
        options={"customProperties": custom} if custom else {},
    )


def import_iceberg_json(doc: Dict[str, Any],
                        table_name: Optional[str] = None) -> DataContract:
    fields = doc.get("fields")
    if not isinstance(fields, list):
        raise ValueError("invalid Iceberg schema: 'fields' must be a list")
    identifier_ids = list(doc.get("identifier-field-ids") or [])
    props = []
    pk_position = 1
    for f in fields:
        if not isinstance(f, dict) or "name" not in f or "type" not in f:
            raise ValueError(f"invalid Iceberg schema field: {f!r}")
        prop = _iceberg_type_to_property(
            f["name"], f["type"], bool(f.get("required", False)),
            f.get("id"), f.get("doc"))
        if f.get("id") in identifier_ids:
            prop.primary_key = True
            prop.primary_key_position = pk_position
            prop.required = True
            pk_position += 1
        props.append(prop)
    obj = SchemaObject(name=table_name or "iceberg_table",
                       physical_type="table", properties=props)
    return DataContract(id="my-data-contract", version="1.0.0",
                        schema_objects=[obj])


def import_iceberg_json_file(path: str,
                             table_name: Optional[str] = None) -> DataContract:
    with open(path, "r", encoding="utf-8") as f:
        return import_iceberg_json(json.load(f), table_name=table_name)


# ---------------------------------------------------------------------------
# DBML -> contract (reference imports/dbml_importer.py — there via pydbml;
# here a compact parser over the public DBML grammar: Project note, Table
# blocks with [pk, unique, not null, Note: "..."] column attributes,
# table-level Notes, and Ref: lines -> customProperties.references)
# ---------------------------------------------------------------------------

_DBML_IDENT = r'(?:"[^"]+"|[A-Za-z_][\w]*)'


def _dbml_unquote(s: str) -> str:
    s = s.strip()
    if len(s) >= 2 and s[0] == '"' and s[-1] == '"':
        return s[1:-1]
    return s


def _dbml_note(text: str) -> Optional[str]:
    m = re.search(r"Note\s*:\s*(?:'''(.*?)'''|\"((?:[^\"\\]|\\.)*)\"|'((?:[^'\\]|\\.)*)')",
                  text, re.IGNORECASE | re.DOTALL)
    if not m:
        return None
    return next(g for g in m.groups() if g is not None).strip()


def import_dbml(text: str, import_schemas: Optional[list] = None,
                import_tables: Optional[list] = None) -> DataContract:
    from datacontract_cli_spark.sources.sql_ddl import (
        _matched_paren,
        map_type_from_sql,
    )

    text = re.sub(r"//[^\n]*", "", text)

    name = None
    description = None
    pm = re.search(r'Project\s+("?[^"{\s]+"?|"[^"]+")\s*\{', text)
    if pm:
        name = _dbml_unquote(pm.group(1))
        close = text.find("}", pm.end())
        if close > 0:
            description = _dbml_note(text[pm.end():close])

    # Ref: [schema.]table.col (>|<|-) [schema.]table.col
    references: Dict[tuple, str] = {}
    for rm in re.finditer(
            r"Ref\s*:\s*([\w.\"]+)\s*([<>-])\s*([\w.\"]+)", text):
        left, op, right = rm.group(1), rm.group(2), rm.group(3)
        child, parent = (left, right) if op in (">", "-") else (right, left)
        cparts = [_dbml_unquote(p) for p in child.split(".")]
        pparts = [_dbml_unquote(p) for p in parent.split(".")]
        if len(cparts) >= 2 and len(pparts) >= 2:
            references[(cparts[-2], cparts[-1])] = f"{pparts[-2]}.{pparts[-1]}"

    objects = []
    for tm in re.finditer(
            rf"Table\s+({_DBML_IDENT}(?:\.{_DBML_IDENT})?)\s*\{{", text):
        qualified = tm.group(1)
        parts = [_dbml_unquote(p) for p in qualified.split(".")]
        schema_name = parts[0] if len(parts) > 1 else None
        table_name = parts[-1]
        if import_schemas and schema_name not in import_schemas:
            continue
        if import_tables and table_name not in import_tables:
            continue
        open_idx = tm.end() - 1
        close = _matched_paren(text.replace("{", "(").replace("}", ")"), open_idx)
        body = text[open_idx + 1:close if close > 0 else len(text)]

        props: List[Property] = []
        table_note = None
        pk_position = 1
        for line in body.split("\n"):
            line = line.strip()
            if not line:
                continue
            if re.match(r"Note\s*:", line, re.IGNORECASE):
                table_note = _dbml_note(line)
                continue
            cm = re.match(
                rf"({_DBML_IDENT})\s+({_DBML_IDENT}(?:\([^)]*\))?)\s*(\[.*\])?\s*$",
                line)
            if not cm:
                continue
            col = _dbml_unquote(cm.group(1))
            ctype = _dbml_unquote(cm.group(2))
            attrs = cm.group(3) or ""
            note = _dbml_note(attrs)
            # flags must not match words inside the Note text
            flags = re.sub(
                r"Note\s*:\s*(?:'''.*?'''|\"(?:[^\"\\]|\\.)*\"|'(?:[^'\\]|\\.)*')",
                "", attrs, flags=re.IGNORECASE | re.DOTALL).lower()
            is_pk = bool(re.search(r"\bpk\b|\bprimary\s+key\b", flags))
            required = "not null" in flags
            unique = bool(re.search(r"\bunique\b", flags))
            logical, fmt = map_type_from_sql(ctype)
            options: Dict[str, Any] = {}
            if fmt:
                options["format"] = fmt
            ref = references.get((table_name, col))
            if ref:
                options.setdefault("customProperties", {})["references"] = ref
            props.append(Property(
                name=col, logical_type=logical, physical_type=ctype,
                description=note, required=required or is_pk, unique=unique,
                primary_key=is_pk,
                primary_key_position=pk_position if is_pk else None,
                options=options,
            ))
            if is_pk:
                pk_position += 1
        obj = SchemaObject(name=table_name, physical_type="table",
                           description=table_note, properties=props)
        if schema_name:
            # namespace rides in physical_name-free custom lane like the
            # reference's customProperties namespace marker
            obj.physical_name = table_name
        objects.append(obj)

    if not objects:
        raise ValueError("no Table blocks found in DBML source")
    return DataContract(id="my-data-contract", name=name,
                        description=description, version="1.0.0",
                        schema_objects=objects)


def import_dbml_file(path: str, **kwargs) -> DataContract:
    with open(path, "r", encoding="utf-8") as f:
        return import_dbml(f.read(), **kwargs)


# ---------------------------------------------------------------------------
# Great Expectations suite -> contract (inverse of export_code's exporter;
# beyond-reference: the reference only EXPORTS to GX, but pipelines
# migrating from GX need the other direction)
# ---------------------------------------------------------------------------

_GX_TYPE_TO_LOGICAL = {
    # spark / GX / python spellings all normalize to contract logical types
    "stringtype": "string", "str": "string", "string": "string",
    "text": "string", "varchar": "string",
    "integertype": "integer", "longtype": "integer", "int": "integer",
    "integer": "integer", "bigint": "integer", "int64": "integer",
    "doubletype": "number", "floattype": "number", "float": "number",
    "double": "number", "number": "number", "float64": "number",
    "decimaltype": "number", "numeric": "number",
    "booleantype": "boolean", "bool": "boolean", "boolean": "boolean",
    "timestamptype": "timestamp", "datetime": "timestamp",
    "timestamp": "timestamp", "datetype": "date", "date": "date",
}


def import_great_expectations(suite: Any, name: str = "model",
                              contract_id: Optional[str] = None) -> DataContract:
    """Great Expectations suite JSON (dict, string, or path) -> contract.

    Structural expectations map to fields (ordered column list, types,
    not-null, unique, lengths/ranges/sets/regex); row-count expectations
    become table-level quality rules; anything unmapped is preserved as a
    ``engine: great-expectations`` quality rule carrying the original
    expectation — so export_code.to_great_expectations round-trips it."""
    from datacontract_cli_spark.model.contract import QualityRule

    if isinstance(suite, str):
        if suite.lstrip().startswith("{"):
            suite = json.loads(suite)
        else:
            with open(suite, "r", encoding="utf-8") as f:
                suite = json.load(f)

    props: Dict[str, Property] = {}
    order: list = []
    table_quality: list = []

    def _prop(column: str) -> Property:
        if column not in props:
            props[column] = Property(name=column)
            order.append(column)
        return props[column]

    def _preserve(etype, kwargs, meta, column):
        # lossless fallback: anything not mapped structurally survives as
        # an engine=great-expectations quality rule the GX exporter
        # re-emits verbatim
        from datacontract_cli_spark.model.contract import QualityRule
        rule = QualityRule(type="custom", engine="great-expectations",
                           implementation=json.dumps(
                               {"type": etype, "kwargs": kwargs,
                                "meta": meta or {}}))
        if column:
            _prop(column).quality.append(rule)
        else:
            table_quality.append(rule)

    for exp in suite.get("expectations") or []:
        etype = exp.get("type") or exp.get("expectation_type") or ""
        kwargs = exp.get("kwargs") or {}
        column = kwargs.get("column")
        if etype == "expect_table_columns_to_match_ordered_list":
            for c in kwargs.get("column_list") or []:
                _prop(c)
        elif etype == "expect_column_values_to_be_of_type" and column:
            t = str(kwargs.get("type_") or kwargs.get("type") or "").lower()
            lt = _GX_TYPE_TO_LOGICAL.get(t)
            if lt:
                _prop(column).logical_type = lt
            else:
                # unknown type spelling: don't silently drop the expectation
                _preserve(etype, kwargs, exp.get("meta"), column)
        elif etype == "expect_column_values_to_not_be_null" and column:
            _prop(column).required = True
        elif etype == "expect_column_values_to_be_unique" and column:
            _prop(column).unique = True
        elif etype == "expect_column_value_lengths_to_be_between" and column:
            p = _prop(column)
            if kwargs.get("min_value") is not None:
                p.options["minLength"] = kwargs["min_value"]
            if kwargs.get("max_value") is not None:
                p.options["maxLength"] = kwargs["max_value"]
        elif etype == "expect_column_values_to_be_between" and column:
            p = _prop(column)
            if kwargs.get("min_value") is not None:
                p.options["minimum"] = kwargs["min_value"]
            if kwargs.get("max_value") is not None:
                p.options["maximum"] = kwargs["max_value"]
        elif etype == "expect_column_values_to_be_in_set" and column:
            _prop(column).options["enum"] = list(kwargs.get("value_set") or [])
        elif etype == "expect_column_values_to_match_regex" and column:
            _prop(column).options["pattern"] = kwargs.get("regex")
        elif etype == "expect_table_row_count_to_be_between":
            table_quality.append(QualityRule(
                type="library", metric="rowCount",
                must_be_ge=kwargs.get("min_value"),
                must_be_le=kwargs.get("max_value")))
        else:
            _preserve(etype, kwargs, exp.get("meta"), column)

    suite_name = (suite.get("name") or suite.get("expectation_suite_name")
                  or name).split(".")[0]
    return DataContract(
        id=contract_id or suite_name or name,
        version="0.0.1",
        schema_objects=[SchemaObject(name=suite_name or name,
                                     properties=[props[c] for c in order],
                                     quality=table_quality)],
    )


def import_great_expectations_file(path: str, **kwargs) -> DataContract:
    return import_great_expectations(path, **kwargs)


# ---------------------------------------------------------------------------
# object-storage importer (reference imports/object_storage_importer.py:1-120)
# ---------------------------------------------------------------------------

# file formats an object-storage server can be tested against, by suffix
_OBJ_FORMATS_BY_SUFFIX = {".json": "json", ".ndjson": "json", ".jsonl": "json",
                          ".csv": "csv", ".parquet": "parquet"}
_OBJ_SUPPORTED = ("csv", "delta", "json", "parquet")

# the import format is what a user types; the server type is what goes into
# the contract (ODCS calls ADLS `azure` and has no GCS type — GCS speaks the
# S3 protocol through its interoperability endpoint, so a GCS import writes
# an `s3` server pinned to that endpoint)
_OBJ_SERVER_TYPES = {"s3": "s3", "gcs": "s3", "adls": "azure"}
GCS_ENDPOINT_URL = "https://storage.googleapis.com"
_OBJ_DEFAULT_ENDPOINTS = {"gcs": GCS_ENDPOINT_URL}

_OBJ_EXAMPLES = {"s3": "s3://my-bucket/orders/*.json",
                 "azure": "abfss://my-container/orders/*.json"}


def normalize_object_location(location: Optional[str],
                               import_format: str) -> Optional[str]:
    """Rewrite a GCS location to the s3:// scheme the S3 reader expects."""
    if location and import_format == "gcs":
        for scheme in ("gs://", "gcs://"):
            if location.startswith(scheme):
                return "s3://" + location[len(scheme):]
    return location


def detect_object_format(location: str) -> Optional[str]:
    """Format from the object suffix; delta has none, so it needs an
    explicit file_format."""
    m = re.search(r"(\.[A-Za-z0-9]+)(?:\?.*)?$", location)
    return _OBJ_FORMATS_BY_SUFFIX.get(m.group(1).lower()) if m else None


def object_schema_name(location: str) -> str:
    """Name the schema after the object, or after the prefix when the last
    path segment is a glob."""
    segment = location.rstrip("/").rsplit("/", 1)[-1]
    if "*" in segment or "?" in segment or not segment:
        segment = (location.rstrip("/").rsplit("/", 2)[-2]
                   if "/" in location.rstrip("/") else segment)
    segment = re.sub(r"\.[A-Za-z0-9]+$", "", segment)
    return re.sub(r"[^0-9A-Za-z_]+", "_", segment).strip("_") or "data"


def import_object_storage(spark: SparkSession, location: Optional[str],
                          import_format: str = "s3",
                          file_format: Optional[str] = None,
                          delimiter: Optional[str] = None,
                          endpoint_url: Optional[str] = None,
                          contract_id: Optional[str] = None) -> DataContract:
    """Infer a contract by reflecting the file schemas at an object-storage
    location (reference imports/object_storage_importer.py — there via a
    DuckDB DESCRIBE; here via the same Spark reader ``test`` will later
    verify with, so the import authenticates and types identically).

    Local paths and ``file://`` URIs exercise the full lane offline; remote
    schemes (``s3a://``, ``abfss://``) additionally need the connector jars
    on the classpath — same env gate as the delta/iceberg sources."""
    from datacontract_cli_spark.model.contract import Server

    server_type = _OBJ_SERVER_TYPES[import_format]
    if not location:
        raise ValueError(
            f"the location is required for the {import_format} import, "
            f"e.g. --source {_OBJ_EXAMPLES[server_type]}")
    location = normalize_object_location(location, import_format)
    fmt = (file_format or detect_object_format(location) or "").lower()
    if fmt not in _OBJ_SUPPORTED:
        raise ValueError(
            f"could not tell the format of {location!r}; pass --file-format "
            f"with one of: {', '.join(_OBJ_SUPPORTED)}")
    endpoint_url = endpoint_url or _OBJ_DEFAULT_ENDPOINTS.get(import_format)

    # reflect through the Spark reader (s3:// rides Hadoop's s3a connector)
    read_location = re.sub(r"^s3://", "s3a://", location)
    if fmt == "parquet":
        df = spark.read.parquet(read_location)
    elif fmt == "csv":
        reader = spark.read.option("header", "true") \
            .option("inferSchema", "true")
        if delimiter:
            reader = reader.option("sep", delimiter)
        df = reader.csv(read_location)
    elif fmt == "json":
        df = spark.read.json(read_location)
    else:  # delta (jar-gated, same as sources/readers.py's delta switch)
        df = spark.read.format("delta").load(read_location)
    if not df.schema.fields:
        raise ValueError(f"no columns found at {location!r}")

    options: Dict[str, Any] = {}
    if delimiter:
        options["delimiter"] = delimiter
    if endpoint_url:
        options["endpointUrl"] = endpoint_url
    name = object_schema_name(location)
    props = [spark_type_to_property(f.name, f.dataType)
             for f in df.schema.fields]
    for prop, field in zip(props, df.schema.fields):
        prop.required = not field.nullable
    return DataContract(
        id=contract_id or name,
        version="0.0.1",
        schema_objects=[SchemaObject(name=name, properties=props)],
        servers=[Server(server="production", type=server_type, format=fmt,
                        location=location, options=options)],
    )


# ---------------------------------------------------------------------------
# Lakehouse table directories -> contract (pure metadata, no data scan)
# ---------------------------------------------------------------------------

def import_iceberg_table(path: str,
                         table_name: Optional[str] = None) -> DataContract:
    """Contract from a Hadoop-layout Iceberg table DIRECTORY: the current
    schema (field ids, required flags, identifier-field-ids -> primary
    keys) comes straight from ``metadata/vN.metadata.json`` — the same
    walk the pyiceberg-based reference importer performs
    (imports/iceberg_importer.py:37-65), with an ``iceberg`` server bound
    to the path so `test` runs against the table immediately."""
    import os

    from datacontract_cli_spark.model.contract import Server
    from datacontract_cli_spark.sources.iceberg_table import (
        load_table_metadata,
    )

    meta = load_table_metadata(path)
    if meta.get("schemas"):
        sid = meta.get("current-schema-id", 0)
        sch = next((s for s in meta["schemas"]
                    if s.get("schema-id") == sid), meta["schemas"][-1])
    else:
        sch = meta.get("schema") or {}
    name = table_name or os.path.basename(
        os.path.abspath(path).rstrip("/"))
    contract = import_iceberg_json(
        {"fields": sch.get("fields", []),
         "identifier-field-ids": sch.get("identifier-field-ids", [])},
        table_name=name)
    contract.servers = [Server(server="lake", type="iceberg", path=path)]
    return contract


def import_delta_table(path: str,
                       table_name: Optional[str] = None) -> DataContract:
    """Contract from a Delta table DIRECTORY: replay the log's latest
    ``metaData`` action — its ``schemaString`` is a Spark StructType JSON,
    so types map through the same converter the live-session importer
    uses; partition columns are recorded on the model description and a
    ``delta`` server binds the path."""
    import json as _json
    import os

    from pyspark.sql import types as T

    from datacontract_cli_spark.model.contract import Server
    from datacontract_cli_spark.sources.delta_table import _replay

    state = _replay(path)
    md = state["metadata"]
    st = T.StructType.fromJson(_json.loads(md["schemaString"]))
    props = [spark_type_to_property(f.name, f.dataType)
             for f in st.fields]
    for prop, field in zip(props, st.fields):
        prop.required = not field.nullable
    part_cols = md.get("partitionColumns") or []
    name = table_name or os.path.basename(
        os.path.abspath(path).rstrip("/"))
    obj = SchemaObject(
        name=name, physical_type="table",
        description=(f"partitioned by ({', '.join(part_cols)})"
                     if part_cols else None),
        properties=props)
    return DataContract(id=name, version="0.0.1", schema_objects=[obj],
                        servers=[Server(server="lake", type="delta",
                                        path=path)])
