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
