"""Vectorized JSON-Schema-style validation of a JSON string column.

Replaces the reference's row-by-row Python jsonschema loop
(datacontract/engines/datacontract/check_jsonschema.py:90-114 — exactly the
per-row Python the north rule forbids) with compiled Catalyst expressions:
``from_json`` with a strict schema parses once per row inside codegen;
corrupt records, missing required fields, and type mismatches all fall out
of the parsed struct with plain column predicates. One aggregation pass
returns every count.
"""

from __future__ import annotations

from typing import Dict, List, Optional

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from datacontract_cli_spark.model.contract import SchemaObject
from datacontract_cli_spark.sources.readers import contract_schema


def json_validation_counts(
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    required: Optional[List[str]] = None,
) -> Dict[str, int]:
    """One-pass counts: rows, null, corrupt (unparseable), and per-required-
    field missing counts for a JSON string column."""
    raw = F.col(json_col)
    parsed = F.from_json(raw, schema)
    exprs = [
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.when(raw.isNull(), 1).otherwise(0)).alias("null_count"),
        F.sum(F.when(raw.isNotNull() & parsed.isNull(), 1).otherwise(0)).alias("corrupt_count"),
    ]
    for field in required or []:
        exprs.append(
            F.sum(
                F.when(raw.isNotNull() & parsed.isNotNull()
                       & parsed.getField(field).isNull(), 1).otherwise(0)
            ).alias(f"missing_{field}")
        )
    row = df.agg(*exprs).collect()[0].asDict()
    return {k: int(v) for k, v in row.items()}


def json_violations(
    df: DataFrame,
    json_col: str,
    schema: T.StructType,
    required: Optional[List[str]] = None,
    id_cols: Optional[List[str]] = None,
    limit: int = 5,
) -> DataFrame:
    """The violating rows themselves (corrupt or missing a required field),
    deterministically ordered, capped — the failed-samples analogue."""
    raw = F.col(json_col)
    parsed = F.from_json(raw, schema)
    bad = raw.isNotNull() & parsed.isNull()
    for field in required or []:
        bad = bad | (raw.isNotNull() & parsed.isNotNull() & parsed.getField(field).isNull())
    cols = (id_cols or []) + [json_col]
    out = df.filter(bad).select(*cols)
    if id_cols:
        out = out.orderBy(*id_cols)
    return out.limit(limit)


def validate_json_model(df: DataFrame, json_col: str, obj: SchemaObject) -> Dict[str, int]:
    """Contract-driven entry: the schema object's property tree defines the
    expected JSON shape; its required flags define the required list."""
    schema = contract_schema(obj)
    required = [p.column for p in obj.properties if p.required]
    return json_validation_counts(df, json_col, schema, required)
