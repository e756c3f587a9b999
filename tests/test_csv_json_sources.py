"""File-source binding: CSV/JSON raw-vs-cast views, schema evolution,
exact diagnostics parity with the reference's engineered fixture style
(reference: tests/test_test_diagnostics.py, tests/test_test_schema_evolution.py)."""

import json
import os
import shutil

import pytest

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract
from datacontract_cli_spark.model.run import ResultEnum

HERE = os.path.dirname(__file__)
FIXTURE = os.path.join(HERE, "fixtures", "orders_diag")


@pytest.fixture()
def contract(tmp_path):
    shutil.copy(os.path.join(FIXTURE, "orders.csv"), tmp_path / "orders.csv")
    c = load_contract(os.path.join(FIXTURE, "datacontract.yaml"))
    c.servers[0].path = str(tmp_path / "orders.csv").replace("orders.csv", "{model}.csv")
    return c


def test_csv_diagnostics_exact(spark, contract):
    run = SparkContractEngine(spark, include_failed_samples=True).test(contract)
    by_key = {c.key: c for c in run.checks}

    max_len = by_key["orders__email__field_max_length"]
    assert max_len.result is ResultEnum.failed
    assert max_len.diagnostics == {
        "metric": "invalid_count",
        "field": "email",
        "value": 1,
        "threshold": "= 0",
        "row_count": 5,
        "failed_fraction": 0.2,
        "constraint": {"max_length": 20},
    }

    required = by_key["orders__email__field_required"]
    assert required.result is ResultEnum.failed
    assert required.diagnostics["value"] == 1
    assert required.diagnostics["failed_fraction"] == 0.2

    regex = by_key["orders__email__field_regex"]
    assert regex.result is ResultEnum.failed
    assert regex.diagnostics["value"] == 1

    pk = by_key["orders__order_id__field_primary_key_unique"]
    assert pk.result is ResultEnum.failed
    assert pk.diagnostics["value"] == 1  # one duplicated key group (id=2)

    minimum = by_key["orders__amount__field_minimum"]
    assert minimum.result is ResultEnum.failed
    assert minimum.diagnostics["value"] == 1

    # CSV read with the contract schema → types match the contract
    assert by_key["orders__order_id__field_type"].result is ResultEnum.passed
    assert by_key["orders__amount__field_type"].result is ResultEnum.passed

    # failed samples: identifier (order_id) + offending column, ordered
    assert required.failedSamples == [{"order_id": 4, "email": None}]


def test_missing_column_fails_presence_but_not_crash(spark, contract, tmp_path):
    # drop the email column from the file → presence fails, data checks on
    # email see typed NULLs
    (tmp_path / "orders.csv").write_text("order_id,amount\n1,5.0\n2,6.0\n")
    run = SparkContractEngine(spark).test(contract)
    by_key = {c.key: c for c in run.checks}
    assert by_key["orders__email__field_is_present"].result is ResultEnum.failed
    assert by_key["orders__email__field_required"].result is ResultEnum.failed
    assert by_key["orders__email__field_required"].diagnostics["value"] == 2
    assert by_key["orders__order_id__field_is_present"].result is ResultEnum.passed


def test_json_source_with_schema_evolution(spark, tmp_path):
    # two NDJSON files with different shapes (schema evolution tolerated,
    # like the reference's union_by_name)
    f1 = tmp_path / "events.json"
    rows = [{"id": 1, "kind": "a"}, {"id": 2, "kind": "b"}]
    rows2 = [{"id": 3, "kind": "c", "extra": "x"}]
    f1.write_text("\n".join(json.dumps(r) for r in rows + rows2))
    contract = load_contract_str_for_json(str(tmp_path))
    run = SparkContractEngine(spark).test(contract)
    by_key = {c.key: c for c in run.checks}
    assert by_key["events__id__field_is_present"].result is ResultEnum.passed
    assert by_key["events__kind__field_enum"].result is ResultEnum.passed
    assert run.result is ResultEnum.passed


def load_contract_str_for_json(dirpath: str):
    from datacontract_cli_spark.model.contract import load_contract_str

    return load_contract_str(f"""
id: events-json
version: 0.1.0
servers:
  - server: local
    type: local
    format: json
    path: "{dirpath}/{{model}}.json"
schema:
  - name: events
    properties:
      - name: id
        logicalType: integer
        required: true
      - name: kind
        logicalType: string
        logicalTypeOptions:
          enum: [a, b, c]
""")
