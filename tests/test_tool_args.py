"""Per-tool JSON-Schema argument validation."""

import pytest

from datacontract_cli_spark.operators.jsonschema import (
    tool_args_violation_counts,
    validate_tool_args,
)

SEARCH = {"type": "object", "required": ["query"],
          "properties": {"query": {"type": "string", "minLength": 1},
                         "limit": {"type": "integer", "minimum": 1}}}
FETCH = {"type": "object", "required": ["url"],
         "properties": {"url": {"type": "string", "pattern": "^https?://"}}}


def _df(spark):
    return spark.createDataFrame(
        [
            (1, "search", '{"query": "spark", "limit": 5}'),   # valid
            (2, "search", '{"limit": 0}'),                     # 2 errors
            (3, "fetch", '{"url": "https://example.com"}'),    # valid
            (4, "fetch", '{"url": "ftp://example.com"}'),      # bad pattern
            (5, "fetch", "not json"),                          # corrupt
            (6, "think", "{}"),                                # no schema
            (7, None, "{}"),                                   # null tool
        ],
        "turn_id long, tool string, args string",
    )


def test_validate_tool_args_per_row(spark):
    out = {r["turn_id"]: list(r["errors"]) for r in
           validate_tool_args(_df(spark), {"search": SEARCH, "fetch": FETCH},
                              args_col="args").collect()}
    assert out[1] == [] and out[3] == []
    assert "data must contain ['query'] properties" in out[2]
    assert any("limit" in e for e in out[2])
    assert any("pattern" in e for e in out[4])
    assert out[5] == ["data is not parseable JSON"]
    assert out[6] == [] and out[7] == []  # unknown='ignore'


def test_validate_tool_args_flag_unknown(spark):
    out = {r["turn_id"]: list(r["errors"]) for r in
           validate_tool_args(_df(spark), {"search": SEARCH},
                              args_col="args", unknown="flag").collect()}
    assert out[3] == ["unknown tool 'fetch'"]
    assert out[7] == ["unknown tool 'null'"]


def test_tool_args_violation_counts(spark):
    out = {r["tool"]: (r["n_rows"], r["n_invalid"]) for r in
           tool_args_violation_counts(
               _df(spark), {"search": SEARCH, "fetch": FETCH},
               args_col="args").collect()}
    assert out["search"] == (2, 1)
    assert out["fetch"] == (3, 2)
    assert out["think"] == (1, 0)


def test_validate_tool_args_rejects_pattern_properties(spark):
    with pytest.raises(ValueError, match="patternProperties"):
        validate_tool_args(_df(spark),
                           {"x": {"patternProperties": {"^a": {}}}},
                           args_col="args")


def test_validate_tool_args_no_shuffle(spark):
    plan = validate_tool_args(_df(spark), {"search": SEARCH, "fetch": FETCH},
                              args_col="args") \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


_CONTRACT = """
apiVersion: v3.0.2
kind: DataContract
id: tool-args
version: 1.0.0
schema:
  - name: calls
    properties:
      - name: turn_id
        logicalType: integer
      - name: tool
        logicalType: string
      - name: args
        logicalType: string
        quality:
          - type: library
            metric: toolArgsValid
            description: tool arguments match their schemas
            arguments:
              toolColumn: tool
              schemas:
                search:
                  type: object
                  required: [query]
                  properties:
                    query: {type: string}
            mustBe: 0
"""


def test_tool_args_valid_contract_check(spark):
    from datacontract_cli_spark import SparkContractEngine, load_contract_str

    contract = load_contract_str(_CONTRACT)
    engine = SparkContractEngine(spark, include_failed_samples=True)
    good = spark.createDataFrame(
        [(1, "search", '{"query": "x"}'), (2, "think", "{}"), (3, None, None)],
        "turn_id long, tool string, args string")
    run = engine.test(contract, tables={"calls": good})
    chk = {c.key: c for c in run.checks}["calls__args__tool_args_valid"]
    assert chk.result.value == "passed", chk.reason

    bad = spark.createDataFrame(
        [(1, "search", '{"query": "x"}'), (2, "search", '{"limit": 3}'),
         (3, "search", "not json")],
        "turn_id long, tool string, args string")
    run2 = engine.test(contract, tables={"calls": bad})
    chk2 = {c.key: c for c in run2.checks}["calls__args__tool_args_valid"]
    assert chk2.result.value == "failed"
    assert chk2.diagnostics["value"] == 2
    # failed samples surface the offending rows deterministically
    assert chk2.failedSamples is not None and len(chk2.failedSamples) == 2


def test_tool_args_valid_lint_skips_pattern_properties(spark):
    from datacontract_cli_spark import load_contract_str
    from datacontract_cli_spark.checks.compile import compile_checks

    y = _CONTRACT.replace(
        "                search:",
        "                search:\n"
        "                  patternProperties: {'^x': {}}\n"
        "                search_unused:")
    specs = compile_checks(load_contract_str(y), None)
    assert not any(s.type == "field_tool_args_valid" for s in specs)
