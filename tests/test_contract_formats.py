"""Contract-format coverage: legacy DCS layout, schema_name scoping,
nested-type checks end-to-end, server parsing."""

from pyspark.sql import functions as F

from datacontract_cli_spark.checks.compile import compile_checks
from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.model.run import ResultEnum

LEGACY_DCS = """
dataContractSpecification: 1.1.0
id: legacy-orders
info:
  title: Orders
  version: 2.0.0
servers:
  production:
    type: s3
    format: parquet
    path: s3://bucket/orders
models:
  orders:
    type: table
    fields:
      order_id:
        type: bigint
        required: true
        primaryKey: true
      status:
        type: string
        enum: [open, closed]
      total:
        type: decimal
        minimum: 0
"""


def test_legacy_dcs_parses_and_compiles():
    c = load_contract_str(LEGACY_DCS)
    assert c.id == "legacy-orders"
    assert c.version == "2.0.0"
    assert c.servers[0].server == "production"
    assert c.servers[0].type == "s3"
    obj = c.schema_object("orders")
    assert [p.name for p in obj.properties] == ["order_id", "status", "total"]
    assert obj.properties[0].primary_key
    assert obj.properties[1].options["enum"] == ["open", "closed"]

    keys = {s.key for s in compile_checks(c, None)}
    assert "orders__order_id__field_required" in keys
    assert "orders__order_id__field_primary_key_unique" in keys
    assert "orders__status__field_enum" in keys
    assert "orders__total__field_minimum" in keys


def test_legacy_dcs_runs_against_dataframe(spark):
    c = load_contract_str(LEGACY_DCS)
    df = spark.createDataFrame(
        [(1, "open", 10.0), (2, "closed", 5.0), (3, "weird", -1.0)],
        "order_id bigint, status string, total double",
    )
    run = SparkContractEngine(spark).test(c, tables={"orders": df})
    by = {ck.key: ck for ck in run.checks}
    assert by["orders__status__field_enum"].result is ResultEnum.failed
    assert by["orders__total__field_minimum"].result is ResultEnum.failed
    assert by["orders__order_id__field_primary_key_unique"].result is ResultEnum.passed


NESTED = """
id: nested
version: 0.1.0
schema:
  - name: sessions
    properties:
      - name: session_id
        logicalType: string
        required: true
      - name: user
        logicalType: object
        properties:
          - name: id
            logicalType: integer
            required: false
          - name: name
            logicalType: string
      - name: tags
        logicalType: array
        items:
          name: items
          logicalType: string
"""


def test_nested_type_checks_end_to_end(spark):
    c = load_contract_str(NESTED)
    good = spark.createDataFrame(
        [("s1", (1, "a"), ["x", "y"])],
        "session_id string, user struct<id:long,name:string>, tags array<string>",
    )
    run = SparkContractEngine(spark).test(c, tables={"sessions": good})
    assert run.result is ResultEnum.passed
    nested_checks = [ck for ck in run.checks if ck.type == "field_nested_type"]
    assert {ck.field for ck in nested_checks} == {"user", "tags"}

    bad = spark.createDataFrame(
        [("s1", (1,), [1, 2])],
        "session_id string, user struct<id:long>, tags array<long>",
    )
    run2 = SparkContractEngine(spark).test(c, tables={"sessions": bad})
    by = {ck.key: ck for ck in run2.checks}
    assert by["sessions__user__field_nested_type"].result is ResultEnum.failed
    assert "user.name" in by["sessions__user__field_nested_type"].reason
    # tags declared array<string>, actual array<long> → category mismatch
    assert by["sessions__tags__field_nested_type"].result is ResultEnum.failed


def test_nested_array_type_mismatch_fails(spark):
    c = load_contract_str(NESTED)
    bad = spark.createDataFrame(
        [("s1", (1, "a"), [True])],
        "session_id string, user struct<id:long,name:string>, tags array<boolean>",
    )
    run = SparkContractEngine(spark).test(c, tables={"sessions": bad})
    ck = run.check("sessions__tags__field_nested_type")
    assert ck.result is ResultEnum.failed
    assert "tags[]" in ck.reason


def test_schema_name_scoping(spark):
    c = load_contract_str("""
id: multi
version: 0.1.0
schema:
  - name: a
    properties: [{name: x, logicalType: integer}]
  - name: b
    properties: [{name: y, logicalType: string}]
""")
    all_checks = compile_checks(c, None)
    assert {s.model for s in all_checks} == {"a", "b"}
    only_a = compile_checks(c, None, schema_name="a")
    assert {s.model for s in only_a} == {"a"}
    df = spark.createDataFrame([(1,)], "x bigint")
    run = SparkContractEngine(spark).test(c, tables={"a": df}, schema_name="a")
    assert all(ck.model == "a" for ck in run.checks)
    assert run.result is ResultEnum.passed
