"""dbt exporters: models schema YAML, sources YAML, staging SQL.

Reference behavior: datacontract/export/dbt_exporter.py +
integration/dbt_test_mapping.py — per model a dbt model entry with
materialization/contract config, composite PKs as
dbt_utils.unique_combination_of_columns, per column the adapter-dialect
data_type (sql_type_converter.convert_to_snowflake when no server is
given), not_null/unique as constraints on constraint-supporting
materializations (data_tests otherwise), and logicalTypeOptions mapped to
dbt_expectations tests (value lengths, regex, between with `strictly` for
exclusive bounds) plus accepted_values for enums.
"""

from __future__ import annotations

import json
from typing import Any, Dict, List, Optional

import yaml

from datacontract_cli_spark.model.contract import (
    DataContract,
    Property,
    SchemaObject,
)


def _base_type(prop: Property) -> Optional[str]:
    t = prop.physical_type or prop.logical_type
    if t is None:
        return None
    for sep in ("(", "<"):
        if sep in t:
            return t[: t.index(sep)].strip().lower()
    return t.lower()


def _params(prop: Property) -> Optional[str]:
    t = prop.physical_type or prop.logical_type
    if t and "(" in t and t.endswith(")"):
        return t[t.index("(") + 1:-1]
    return None


def _with_params(base: str, prop: Property) -> str:
    p = _params(prop)
    return f"{base}({p})" if p else base


_SNOWFLAKE = {
    "string": "STRING", "varchar": "VARCHAR", "text": "TEXT",
    "timestamp": "TIMESTAMP_TZ", "timestamp_tz": "TIMESTAMP_TZ",
    "timestamp_ntz": "TIMESTAMP_NTZ", "time": "TIME",
    "number": "NUMBER", "decimal": "NUMBER", "numeric": "NUMBER",
    "binary": "BINARY", "bytes": "BINARY",
}
_SNOWFLAKE_PLAIN = {
    "date": "DATE", "float": "FLOAT", "double": "FLOAT",
    "integer": "NUMBER", "int": "NUMBER", "long": "NUMBER",
    "bigint": "NUMBER", "tinyint": "NUMBER", "smallint": "NUMBER",
    "boolean": "BOOLEAN", "object": "OBJECT", "record": "OBJECT",
    "struct": "OBJECT", "array": "ARRAY",
}
_SPARK = {
    "string": "STRING", "varchar": "STRING", "text": "STRING",
    "integer": "INT", "int": "INT", "long": "BIGINT", "bigint": "BIGINT",
    "number": "DOUBLE", "double": "DOUBLE", "float": "FLOAT",
    "decimal": "DECIMAL", "numeric": "DECIMAL",
    "boolean": "BOOLEAN", "date": "DATE", "timestamp": "TIMESTAMP",
    "timestamp_tz": "TIMESTAMP", "timestamp_ntz": "TIMESTAMP_NTZ",
    "binary": "BINARY", "bytes": "BINARY", "object": "STRUCT",
    "array": "ARRAY",
}


def _adapter_type(prop: Property, adapter: Optional[str]) -> Optional[str]:
    """convert_to_sql_type semantics for the adapters our engine meets;
    unknown adapters fall back to the snowflake table like the reference's
    default (dbt_exporter.py:227)."""
    custom = (prop.options or {}).get("customProperties") or {}
    override = custom.get(f"{(adapter or 'snowflake')}Type")
    if override:
        return str(override)
    base = _base_type(prop)
    if base is None:
        return None
    if (adapter or "").lower() in ("databricks", "spark", "dataframe"):
        mapped = _SPARK.get(base)
        return _with_params(mapped, prop) if mapped in ("DECIMAL",) else mapped
    if base in _SNOWFLAKE:
        return _with_params(_SNOWFLAKE[base], prop)
    if base in _SNOWFLAKE_PLAIN:
        return _SNOWFLAKE_PLAIN[base]
    if _params(prop):
        return prop.physical_type
    return None


def _opt(prop: Property, key: str) -> Any:
    return (prop.options or {}).get(key)


def _enum_values(prop: Property) -> Optional[List[Any]]:
    enum = _opt(prop, "enum")
    if enum:
        return list(enum)
    custom = (prop.options or {}).get("customProperties") or {}
    raw = custom.get("enum")
    if raw:
        if isinstance(raw, list):
            return list(raw)
        try:
            return json.loads(raw)
        except (json.JSONDecodeError, TypeError):
            pass
    for q in prop.quality or []:
        if q.metric == "invalidValues" and q.arguments and q.arguments.get("validValues"):
            return list(q.arguments["validValues"])
    return None


def field_to_data_tests(prop: Property, *, is_primary_key: bool = False,
                        is_single_pk: bool = False,
                        supports_constraints: bool = False,
                        include_dbt_expectations_bounds: bool = True) -> List[Any]:
    """``include_dbt_expectations_bounds=False`` (the dbt-sync lane,
    reference dbt_test_mapping.py:62-71) emits only the dependency-free
    generic tests; length/regex/range bounds become singular SQL instead so
    generated projects need no dbt_expectations package."""
    tests: List[Any] = []
    if not supports_constraints:
        if prop.required or is_primary_key:
            tests.append("not_null")
        if prop.unique or (is_primary_key and is_single_pk):
            tests.append("unique")
    enum = _enum_values(prop)
    if enum:
        tests.append({"accepted_values": {"values": enum}})
    if not include_dbt_expectations_bounds:
        return tests
    min_length, max_length = _opt(prop, "minLength"), _opt(prop, "maxLength")
    if min_length is not None or max_length is not None:
        t: Dict[str, Any] = {}
        if min_length is not None:
            t["min_value"] = min_length
        if max_length is not None:
            t["max_value"] = max_length
        tests.append({"dbt_expectations.expect_column_value_lengths_to_be_between": t})
    if _opt(prop, "pattern") is not None:
        tests.append({"dbt_expectations.expect_column_values_to_match_regex":
                      {"regex": _opt(prop, "pattern")}})
    minimum, maximum = _opt(prop, "minimum"), _opt(prop, "maximum")
    ex_min, ex_max = _opt(prop, "exclusiveMinimum"), _opt(prop, "exclusiveMaximum")
    if (minimum is not None or maximum is not None) and ex_min is None and ex_max is None:
        t = {}
        if minimum is not None:
            t["min_value"] = minimum
        if maximum is not None:
            t["max_value"] = maximum
        tests.append({"dbt_expectations.expect_column_values_to_be_between": t})
    elif (ex_min is not None or ex_max is not None) and minimum is None and maximum is None:
        t = {}
        if ex_min is not None:
            t["min_value"] = ex_min
        if ex_max is not None:
            t["max_value"] = ex_max
        t["strictly"] = True
        tests.append({"dbt_expectations.expect_column_values_to_be_between": t})
    else:
        if minimum is not None:
            tests.append({"dbt_expectations.expect_column_values_to_be_between":
                          {"min_value": minimum}})
        if maximum is not None:
            tests.append({"dbt_expectations.expect_column_values_to_be_between":
                          {"max_value": maximum}})
        if ex_min is not None:
            tests.append({"dbt_expectations.expect_column_values_to_be_between":
                          {"min_value": ex_min, "strictly": True}})
        if ex_max is not None:
            tests.append({"dbt_expectations.expect_column_values_to_be_between":
                          {"max_value": ex_max, "strictly": True}})
    return tests


def _model_type(physical_type: Optional[str]) -> Optional[str]:
    if physical_type is None:
        return None
    return "view" if physical_type.lower() == "view" else "table"


def _supports_constraints(model_type: Optional[str]) -> bool:
    return model_type in ("table", "incremental")


def _column(prop: Property, adapter: Optional[str], supports_constraints: bool,
            is_primary_key: bool, is_single_pk: bool) -> Dict[str, Any]:
    col: Dict[str, Any] = {"name": prop.column}
    dbt_type = _adapter_type(prop, adapter)
    if dbt_type is not None:
        col["data_type"] = dbt_type
    if prop.description:
        col["description"] = prop.description.strip().replace("\n", " ")
    if supports_constraints:
        constraints = []
        if prop.required or is_primary_key:
            constraints.append({"type": "not_null"})
        if prop.unique or (is_primary_key and is_single_pk):
            constraints.append({"type": "unique"})
        if constraints:
            col["constraints"] = constraints
    if prop.classification is not None:
        col.setdefault("meta", {})["classification"] = prop.classification
    if prop.tags:
        col.setdefault("tags", []).extend(prop.tags)
    tests = field_to_data_tests(
        prop, is_primary_key=is_primary_key, is_single_pk=is_single_pk,
        supports_constraints=supports_constraints)
    if tests:
        col["data_tests"] = tests
    return col


def _dbt_model(obj: SchemaObject, contract: DataContract,
               adapter: Optional[str]) -> Dict[str, Any]:
    model_type = _model_type(obj.physical_type)
    model: Dict[str, Any] = {"name": obj.name}
    model["config"] = {"meta": {"data_contract": contract.id}}
    if model_type:
        model["config"]["materialized"] = model_type
    if contract.owner is not None:
        model["config"]["meta"]["owner"] = contract.owner
    if _supports_constraints(model_type):
        model["config"]["contract"] = {"enforced": True}
    if obj.description is not None:
        model["description"] = obj.description.strip().replace("\n", " ")
    pk_cols = [p.column for p in obj.properties if p.primary_key]
    if len(pk_cols) > 1:
        model["data_tests"] = [{"dbt_utils.unique_combination_of_columns":
                                {"combination_of_columns": pk_cols}}]
    single_pk = len(pk_cols) == 1
    columns = [
        _column(p, adapter, _supports_constraints(model_type),
                p.column in pk_cols, single_pk)
        for p in obj.properties
    ]
    if columns:
        model["columns"] = columns
    return model


def _resolve_adapter(contract: DataContract, server: Optional[str]) -> Optional[str]:
    if server is None:
        return None
    found = contract.server(server)
    return found.type if found is not None else server


def to_dbt_models_yaml(contract: DataContract, server: Optional[str] = None) -> str:
    adapter = _resolve_adapter(contract, server)
    dbt = {"version": 2,
           "models": [_dbt_model(o, contract, adapter)
                      for o in contract.schema_objects]}
    return yaml.safe_dump(dbt, indent=2, sort_keys=False, allow_unicode=True)


def to_dbt_sources_yaml(contract: DataContract, server: Optional[str] = None) -> str:
    source: Dict[str, Any] = {"name": contract.id}
    dbt = {"version": 2, "sources": [source]}
    if contract.owner is not None:
        source["meta"] = {"owner": contract.owner}
    if contract.description is not None:
        source["description"] = contract.description.strip().replace("\n", " ")
    found = contract.server(server) if server else None
    adapter = found.type if found is not None else None
    if found is not None:
        if adapter == "bigquery":
            source["database"] = found.options.get("project")
            source["schema"] = found.options.get("dataset")
        else:
            source["database"] = found.options.get("database")
            source["schema"] = found.schema_
    source["tables"] = []
    for obj in contract.schema_objects:
        table: Dict[str, Any] = {"name": obj.name}
        if obj.description is not None:
            table["description"] = obj.description.strip().replace("\n", " ")
        columns = [_column(p, adapter, False, False, False)
                   for p in obj.properties]
        if columns:
            table["columns"] = columns
        source["tables"].append(table)
    return yaml.dump(dbt, indent=2, sort_keys=False, allow_unicode=True)


def to_dbt_staging_sql(contract: DataContract, schema_name: str) -> str:
    obj = contract.schema_object(schema_name)
    if obj is None:
        raise ValueError(f"schema object '{schema_name}' not found in contract")
    columns = [p.column for p in obj.properties]
    return f"""
    select
        {", ".join(columns)}
    from {{{{ source('{contract.id}', '{obj.name}') }}}}
"""
