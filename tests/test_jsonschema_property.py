"""Property-based differential test: the variant Column compiler must agree
with the (reference-semantics-adjusted) jsonschema library on randomly
generated schemas x documents.

Documents are batched per hypothesis-generated case list and validated in
ONE Spark job per schema to keep runtime sane."""

import json

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from datacontract_cli_spark.operators import jsonschema as js


_SAFE_PATTERNS = ["^[a-z]+$", "^[0-9]{2,4}$", "x", "^$"]
_KEYS = ["alpha", "beta", "gamma", "delta"]


@st.composite
def prop_schema(draw):
    jt = draw(st.sampled_from(["string", "integer", "number", "boolean",
                               "array", "object"]))
    schema = {"type": jt if draw(st.booleans()) else [jt, "null"]}
    if jt == "string":
        if draw(st.booleans()):
            schema["pattern"] = draw(st.sampled_from(_SAFE_PATTERNS))
        if draw(st.booleans()):
            schema["minLength"] = draw(st.integers(0, 3))
        if draw(st.booleans()):
            schema["maxLength"] = draw(st.integers(3, 8))
        if draw(st.booleans()):
            schema["enum"] = draw(st.lists(st.sampled_from(
                ["aa", "bb", "cc", "07", "x", None]), min_size=1, max_size=3,
                unique=True))
        elif draw(st.booleans()):
            schema["const"] = draw(st.sampled_from(["aa", "07", None]))
    if jt in ("integer", "number"):
        if draw(st.booleans()):
            schema["minimum"] = draw(st.integers(-5, 2))
        if draw(st.booleans()):
            schema["maximum"] = draw(st.integers(3, 10))
    if jt == "array":
        schema["items"] = {"type": draw(st.sampled_from(["string", "integer"]))}
    if jt == "object":
        schema["properties"] = {"inner": {"type": "string"}}
        if draw(st.booleans()):
            schema["required"] = ["inner"]
    return schema


@st.composite
def doc_value(draw):
    return draw(st.one_of(
        st.none(),
        st.booleans(),
        st.integers(-10, 20),
        st.floats(-10, 20, allow_nan=False).map(lambda f: round(f, 3)),
        st.sampled_from(["aa", "bb", "07", "zz9", "", "x" * 10]),
        st.lists(st.one_of(st.integers(0, 5), st.sampled_from(["a", "b"])),
                 max_size=3),
        st.fixed_dictionaries({}, optional={"inner": st.one_of(
            st.sampled_from(["s", "t"]), st.integers(0, 3), st.none())}),
    ))


@st.composite
def schema_and_docs(draw):
    n_props = draw(st.integers(1, 3))
    keys = _KEYS[:n_props]
    schema = {
        "type": "object",
        "properties": {k: draw(prop_schema()) for k in keys},
        "required": draw(st.lists(st.sampled_from(keys), unique=True)),
    }
    docs = []
    for _ in range(draw(st.integers(1, 6))):
        doc = {}
        for k in keys:
            if draw(st.booleans()):
                doc[k] = draw(doc_value())
        docs.append(doc)
    return schema, docs


@pytest.mark.usefixtures("spark")
@settings(max_examples=25, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(case=schema_and_docs())
def test_variant_compiler_agrees_with_jsonschema_lib(spark, case):
    import jsonschema as jslib

    schema, docs = case
    strict_int = jslib.Draft7Validator.TYPE_CHECKER.redefine(
        "integer", lambda c, i: isinstance(i, int) and not isinstance(i, bool))
    validator = jslib.validators.extend(
        jslib.Draft7Validator, type_checker=strict_int)(schema)

    rows = [(json.dumps(d),) for d in docs]
    df = spark.createDataFrame(rows, "value string")
    got = [len(r["errors"]) > 0 for r in
           js.validate_json_rows(df, "value", schema, keep_cols=[],
                                 engine="column").collect()]
    want = [not validator.is_valid(d) for d in docs]
    assert got == want, (schema, docs, got, want)
