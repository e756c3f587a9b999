"""Contract importers — the Spark-relevant subset of the reference's
imports/ surface (parquet/csv/json reflection; avro + jsonschema structural
conversion as exact inverses of our exporters)."""

import json

from datacontract_cli_spark import export
from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.model.run import ResultEnum
from datacontract_cli_spark.sources import importers


CONTRACT = """
id: imp
version: 1.0.0
schema:
  - name: events
    properties:
      - name: event_id
        logicalType: integer
        required: true
      - name: kind
        logicalType: string
        logicalTypeOptions:
          enum: [a, b]
          pattern: "^[ab]$"
      - name: ts
        logicalType: timestamp
      - name: payload
        logicalType: object
        properties:
          - name: score
            logicalType: number
            required: true
      - name: tags
        logicalType: array
        items:
          name: items
          logicalType: string
"""


def test_parquet_import_roundtrips_through_engine(spark, tmp_path):
    df = spark.createDataFrame(
        [(1, "x", 2.5), (2, "y", 3.5)], "id bigint, s string, v double")
    out = str(tmp_path / "t.parquet")
    df.write.parquet(out)
    contract = importers.import_file(spark, out, "parquet", "t")
    names = {p.name: p.logical_type for p in contract.schema_objects[0].properties}
    assert names == {"id": "integer", "s": "string", "v": "number"}
    # a reflected contract must validate its own data cleanly
    run = SparkContractEngine(spark).test(contract, tables={"t": df})
    assert run.result is ResultEnum.passed


def test_csv_and_json_import_infer(spark, tmp_path):
    (tmp_path / "m.csv").write_text("a,b\n1,x\n2,y\n")
    c = importers.import_file(spark, str(tmp_path / "m.csv"), "csv", "m")
    got = {p.name: p.logical_type for p in c.schema_objects[0].properties}
    assert got == {"a": "integer", "b": "string"}

    (tmp_path / "m.jsonl").write_text('{"n": 1, "o": {"k": "v"}}\n')
    c2 = importers.import_file(spark, str(tmp_path / "m.jsonl"), "json", "m")
    by = {p.name: p for p in c2.schema_objects[0].properties}
    assert by["n"].logical_type == "integer"
    assert by["o"].logical_type == "object"
    assert by["o"].properties[0].name == "k"


def test_avro_roundtrip():
    c = load_contract_str(CONTRACT)
    avro = export.to_avro_schema(c)
    back = importers.import_avro_schema(avro)
    obj = back.schema_objects[0]
    by = {p.name: p for p in obj.properties}
    assert by["event_id"].logical_type == "integer" and by["event_id"].required
    assert by["kind"].logical_type == "string" and not by["kind"].required
    assert by["ts"].logical_type == "timestamp"
    assert by["payload"].logical_type == "object"
    assert by["payload"].properties[0].name == "score"
    assert by["tags"].logical_type == "array"
    assert by["tags"].items.logical_type == "string"


def test_jsonschema_roundtrip_keeps_constraints():
    c = load_contract_str(CONTRACT)
    js = export.to_jsonschema_dict(c)
    back = importers.import_jsonschema(js, name="events")
    by = {p.name: p for p in back.schema_objects[0].properties}
    assert by["event_id"].required
    assert by["kind"].options["enum"] == ["a", "b"]
    assert by["kind"].options["pattern"] == "^[ab]$"
    assert by["payload"].properties[0].required  # nested required survives
    assert by["ts"].logical_type == "timestamp"  # via format date-time


def test_avro_import_from_file(tmp_path):
    avsc = {
        "type": "record", "name": "orders",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "status", "type": ["null", {"type": "enum", "name": "st",
                                                 "symbols": ["A", "B"]}]},
            {"name": "placed", "type": {"type": "long",
                                        "logicalType": "timestamp-millis"}},
        ],
    }
    p = tmp_path / "orders.avsc"
    p.write_text(json.dumps(avsc))
    c = importers.import_avro_schema(str(p))
    by = {p2.name: p2 for p2 in c.schema_objects[0].properties}
    assert by["id"].required and by["id"].logical_type == "integer"
    assert not by["status"].required
    assert by["status"].options["enum"] == ["A", "B"]
    assert by["placed"].logical_type == "timestamp"


def test_jsonschema_roundtrip_reference_orders_fixture():
    """import jsonschema -> export jsonschema reproduces the reference's
    orders.json byte-for-byte semantically (reference
    test_roundtrip_jsonschema.py): titles via businessName, descriptions,
    unmapped formats (email), nullable array items."""
    import json as _json

    from datacontract_cli_spark.export import to_jsonschema_dict
    from datacontract_cli_spark.sources.importers import import_jsonschema

    src = "/root/reference/tests/fixtures/import/orders.json"
    contract = import_jsonschema(src)
    with open(src, "r", encoding="utf-8") as f:
        expected = _json.load(f)
    assert to_jsonschema_dict(contract) == expected
    # the title lands in ODCS businessName, like the reference exporter
    obj = contract.schema_objects[0]
    assert obj.business_name == "OrderSchema"
    by_name = {p.name: p for p in obj.properties}
    assert by_name["order_id"].business_name == "Order ID"
    assert by_name["customer_email_address"].options.get("format") == "email"
    assert by_name["line_items"].items.required is False
