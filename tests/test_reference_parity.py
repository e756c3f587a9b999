"""Parity against the reference CLI's own test fixtures.

Runs OUR engine on the reference repo's parquet fixture data (read-only)
with the reference's own contract YAML (legacy DCS), mirroring
reference tests/test_test_parquet.py: the run passes, and every check the
reference would emit exists here with the same key and the same outcome.

Intentional deltas (documented, both strictly-more-checking):
- we emit a field_type check even for categories the reference's DCS
  importer drops (map/bytes) — it passes as unverifiable;
- we keep field_nested_type checks on file sources (the reference skips
  nesting there because its DuckDB coerced view flattens it).
"""

import os

import pytest

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract
from datacontract_cli_spark.model.run import ResultEnum

REF = "/root/reference/tests/fixtures/parquet"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference fixtures not available")


def _run_fixture(spark, contract_file, model, data_file):
    contract = load_contract(os.path.join(REF, contract_file))
    df = spark.read.parquet(os.path.join(REF, "data", data_file))
    return SparkContractEngine(spark).test(contract, tables={model: df})


def test_combined_all_types_pass(spark):
    # combined_no_time.parquet: the reference keeps this variant for engines
    # that cannot read parquet TIME columns (Spark's reader rejects
    # TIME WITH TIME ZONE); the contract declares no time field either way
    run = _run_fixture(spark, "datacontract.yaml", "combined", "combined_no_time.parquet")
    failed = [(c.key, c.result.value, c.reason) for c in run.checks
              if c.result is not ResultEnum.passed]
    assert failed == []
    assert run.result is ResultEnum.passed

    keys = {c.key for c in run.checks}
    # every check the reference's own test sees (24) is present here:
    # 13 presence + 11 categorized type checks
    fields = ["array_field", "bigint_field", "blob_field", "boolean_field",
              "date_field", "decimal_field", "double_field", "float_field",
              "integer_field", "map_field", "string_field", "struct_field",
              "timestamp_field"]
    for f in fields:
        assert f"combined__{f}__field_is_present" in keys, f
    for f in ["array_field", "bigint_field", "boolean_field", "date_field",
              "decimal_field", "double_field", "float_field", "integer_field",
              "string_field", "struct_field", "timestamp_field"]:
        assert f"combined__{f}__field_type" in keys, f


@pytest.mark.parametrize("contract_file,model,data_file", [
    ("datacontract_string.yaml", "covid_testing", "string.parquet"),
    ("datacontract_integer.yaml", "integer_test", "integer.parquet"),
    ("datacontract_bigint.yaml", "bigint_test", "bigint.parquet"),
    ("datacontract_double.yaml", "double_test", "double.parquet"),
    ("datacontract_float.yaml", "float_test", "float.parquet"),
    ("datacontract_boolean.yaml", "boolean_test", "boolean.parquet"),
    ("datacontract_date.yaml", "date_test", "date.parquet"),
    ("datacontract_decimal.yaml", "decimal_test", "decimal.parquet"),
    ("datacontract_timestamp.yaml", "orders", "timestamp.parquet"),
    ("datacontract_timestamp_ntz.yaml", "orders", "timestamp_ntz.parquet"),
    ("datacontract_array.yaml", "array_test", "array.parquet"),
    ("datacontract_struct.yaml", "struct_test", "struct.parquet"),
    ("datacontract_map.yaml", "map_test", "map.parquet"),
    ("datacontract_binary.yaml", "blob_test", "blob.parquet"),
])
def test_per_type_fixture_passes(spark, contract_file, model, data_file):
    contract = load_contract(os.path.join(REF, contract_file))
    # the contract knows its model name; take it from the contract itself
    model = contract.schema_objects[0].name
    run = _run_fixture(spark, contract_file, model, data_file)
    failed = [(c.key, c.result.value, c.reason) for c in run.checks
              if c.result not in (ResultEnum.passed, ResultEnum.warning)]
    assert failed == [], failed
    assert run.result in (ResultEnum.passed, ResultEnum.warning)


def test_invalid_contract_fails_like_reference(spark):
    """datacontract_invalid.yaml declares order_id as date → a bigint column
    must fail field_type (the fixture's data file is absent from the
    snapshot, so the mismatching frame is synthesized with the shape the
    contract expects to violate)."""
    contract = load_contract(os.path.join(REF, "datacontract_invalid.yaml"))
    model = contract.schema_objects[0].name
    df = spark.createDataFrame([(1, 2)], "order_id bigint, some_extra_field bigint")
    run = SparkContractEngine(spark).test(contract, tables={model: df})
    assert run.result is ResultEnum.failed
    bad = run.check(f"{model}__order_id__field_type")
    assert bad is not None and bad.result is ResultEnum.failed
