"""Type-system unit tests (reference layer 1: test_type_normalize,
test_physical_type_match, test_dtype_category equivalents)."""

from pyspark.sql import types as T

from datacontract_cli_spark.checks.physical import parse_type, physical_types_match
from datacontract_cli_spark.checks.types import (
    normalize_type_name,
    property_matches,
    spark_type_to_property,
)
from datacontract_cli_spark.model.contract import Property


def test_normalize_covers_nine_categories():
    cases = {
        "VARCHAR(255)": "string", "text": "string", "uuid": "string",
        "BIGINT": "integer", "int4": "integer", "serial": "integer",
        "decimal(10,2)": "number", "double precision": "number", "real": "number",
        "BOOLEAN": "boolean", "bit": "boolean",
        "timestamp with time zone": "timestamp", "datetime2": "timestamp",
        "timestamp_ntz": "timestamp",
        "DATE": "date",
        "time without time zone": "time",
        "STRUCT<a:int>": "object", "record": "object",
        "array<string>": "array", "list": "array",
    }
    for raw, want in cases.items():
        assert normalize_type_name(raw) == want, raw


def test_uncategorized_types_are_none():
    for raw in ("map<string,int>", "binary", "interval", "null", "blob", "wat"):
        assert normalize_type_name(raw) is None, raw


def test_integer_number_compatible():
    exp = Property(name="x", logical_type="integer")
    act = Property(name="x", logical_type="number")
    ok, _ = property_matches(exp, act)
    assert ok
    exp2 = Property(name="x", logical_type="string")
    ok2, reason = property_matches(exp2, act)
    assert not ok2 and "expected type string" in reason


def test_nested_object_structural_compare():
    exp = Property(name="addr", logical_type="object", properties=[
        Property(name="city", logical_type="string"),
        Property(name="zip", logical_type="integer"),
    ])
    actual = spark_type_to_property("addr", T.StructType([
        T.StructField("city", T.StringType()),
        T.StructField("zip", T.LongType()),
        T.StructField("extra", T.BooleanType()),  # extra actual field: tolerated
    ]))
    ok, _ = property_matches(exp, actual)
    assert ok
    # missing declared child fails with a path-labelled reason
    actual2 = spark_type_to_property("addr", T.StructType([
        T.StructField("city", T.StringType()),
    ]))
    ok2, reason = property_matches(exp, actual2)
    assert not ok2 and "addr.zip" in reason


def test_array_items_compare():
    exp = Property(name="tags", logical_type="array",
                   items=Property(name="items", logical_type="string"))
    ok, _ = property_matches(exp, spark_type_to_property(
        "tags", T.ArrayType(T.StringType())))
    assert ok
    ok2, reason = property_matches(exp, spark_type_to_property(
        "tags", T.ArrayType(T.StructType([T.StructField("a", T.IntegerType())]))))
    assert not ok2 and "tags[]" in reason
    # bare array matches any array
    bare = Property(name="tags", logical_type="array")
    ok3, _ = property_matches(bare, spark_type_to_property(
        "tags", T.ArrayType(T.LongType())))
    assert ok3


def test_parse_type():
    assert parse_type("varchar(255)") == ("varchar", [255])
    assert parse_type("decimal(10, 2)") == ("decimal", [10, 2])
    assert parse_type("TIMESTAMP") == ("timestamp", [])
    assert parse_type("array<string>") == ("array", [])


def test_physical_type_match_families():
    assert physical_types_match("varchar(255)", "string") is True
    assert physical_types_match("bigint", "long") is True
    assert physical_types_match("decimal(10,2)", "decimal(10,2)") is True
    assert physical_types_match("decimal(10,2)", "decimal(12,2)") is False
    assert physical_types_match("int", "bigint") is False
    assert physical_types_match("timestamp_ntz", "timestamp") is True
    assert physical_types_match("weirdtype", "string") is None  # unverifiable
