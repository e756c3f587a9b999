"""Contract ⇄ Spark schema ⇄ ODCS YAML conversions.

Parity with the reference's spark exporter/importer
(datacontract/export/spark_exporter.py:269-402,
datacontract/imports/spark_importer.py:139-176): a contract compiles to a
StructType, a DataFrame's schema imports back into a contract, and a
contract serializes to ODCS-shaped YAML.
"""

from __future__ import annotations

from typing import Any, Dict

import yaml
from pyspark.sql import DataFrame
from pyspark.sql import types as T

from datacontract_cli_spark.checks.types import spark_type_to_property
from datacontract_cli_spark.model.contract import DataContract, Property, SchemaObject
from datacontract_cli_spark.sources.readers import contract_schema


def to_spark_schema(obj: SchemaObject) -> T.StructType:
    """Contract schema object → Spark StructType (required ⇒ not nullable)."""
    base = contract_schema(obj)
    fields = [
        T.StructField(f.name, f.dataType,
                      nullable=not next((p.required for p in obj.properties
                                         if p.column == f.name), False))
        for f in base.fields
    ]
    return T.StructType(fields)


def import_dataframe(df: DataFrame, name: str, contract_id: str = None,
                     version: str = "0.0.1") -> DataContract:
    """Reflect a DataFrame's schema into a contract (Spark → logical types)."""
    props = [spark_type_to_property(f.name, f.dataType) for f in df.schema.fields]
    for prop, field in zip(props, df.schema.fields):
        prop.required = not field.nullable
    return DataContract(
        id=contract_id or name,
        version=version,
        schema_objects=[SchemaObject(name=name, properties=props)],
    )


def _property_dict(p: Property) -> Dict[str, Any]:
    d: Dict[str, Any] = {"name": p.name}
    if p.logical_type:
        d["logicalType"] = p.logical_type
    if p.physical_type:
        d["physicalType"] = p.physical_type
    if p.required:
        d["required"] = True
    if p.unique:
        d["unique"] = True
    if p.primary_key:
        d["primaryKey"] = True
        if p.primary_key_position is not None:
            d["primaryKeyPosition"] = p.primary_key_position
    if p.classification:
        d["classification"] = p.classification
    if p.options:
        d["logicalTypeOptions"] = dict(p.options)
    if p.properties:
        d["properties"] = [_property_dict(c) for c in p.properties]
    if p.items is not None:
        d["items"] = _property_dict(p.items)
    return d


def to_odcs_dict(contract: DataContract) -> Dict[str, Any]:
    return {
        "apiVersion": "v3.0.2",
        "kind": "DataContract",
        "id": contract.id,
        "version": contract.version,
        **({"name": contract.name} if contract.name else {}),
        "schema": [
            {
                "name": o.name,
                "logicalType": o.logical_type,
                **({"physicalName": o.physical_name} if o.physical_name else {}),
                "properties": [_property_dict(p) for p in o.properties],
            }
            for o in contract.schema_objects
        ],
    }


def to_odcs_yaml(contract: DataContract) -> str:
    return yaml.safe_dump(to_odcs_dict(contract), sort_keys=False)
