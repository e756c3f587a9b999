"""Parity with the reference's CSV fixtures: exact diagnostics dicts,
failed-sample shapes, row filters (reference tests: test_test_diagnostics.py,
test_test_failed_samples.py, test_test_row_filter.py)."""

import os

import pytest

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract, load_contract_str
from datacontract_cli_spark.model.run import ResultEnum

REF = "/root/reference/tests/fixtures"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference fixtures not available")


def _find(run, type_, field=None):
    return next(c for c in run.checks
                if c.type == type_ and (field is None or c.field == field))


@pytest.fixture(scope="module")
def diagnostics_run(spark):
    contract = load_contract(os.path.join(REF, "diagnostics", "datacontract.yaml"))
    contract.servers[0].path = os.path.join(REF, "diagnostics", "data", "orders.csv")
    return SparkContractEngine(spark).test(contract)


def test_diagnostics_exact_dict(diagnostics_run):
    max_length = _find(diagnostics_run, "field_max_length", "email")
    assert max_length.result is ResultEnum.failed
    assert max_length.diagnostics == {
        "metric": "invalid_count",
        "field": "email",
        "value": 1,
        "threshold": "= 0",
        "row_count": 5,
        "failed_fraction": 0.2,
        "constraint": {"max_length": 20},
    }

    regex = _find(diagnostics_run, "field_regex", "email")
    assert regex.result is ResultEnum.failed
    assert regex.diagnostics["constraint"] == {"pattern": "^.+@.+$"}
    assert regex.diagnostics["failed_fraction"] == 0.2

    minimum = _find(diagnostics_run, "field_minimum", "amount")
    assert minimum.result is ResultEnum.failed
    assert minimum.diagnostics["constraint"] == {"minimum": 0}

    maximum = _find(diagnostics_run, "field_maximum", "amount")
    assert maximum.result is ResultEnum.failed
    assert maximum.diagnostics["constraint"] == {"maximum": 100}


def test_diagnostics_passing_check_reports_zero_fraction(diagnostics_run):
    required = _find(diagnostics_run, "field_required", "email")
    assert required.result is ResultEnum.passed
    assert required.diagnostics["metric"] == "missing_count"
    assert required.diagnostics["value"] == 0
    assert required.diagnostics["row_count"] == 5
    assert required.diagnostics["failed_fraction"] == 0.0


def test_diagnostics_unique_duplicate(diagnostics_run):
    unique = _find(diagnostics_run, "field_unique", "order_id")
    assert unique.result is ResultEnum.failed
    assert unique.diagnostics["value"] == 1  # order_id 2 duplicated


# --- failed samples fixture ---------------------------------------------------

FAILED_SAMPLES_CONTRACT = f"""
apiVersion: v3.0.2
kind: DataContract
id: failed_samples_test
version: 1.0.0
servers:
  - server: local
    type: local
    path: {REF}/failed_samples/orders.csv
    format: csv
schema:
  - name: orders
    properties:
      - name: id
        logicalType: integer
        unique: true
      - name: email
        logicalType: string
        classification: PII
        logicalTypeOptions:
          pattern: "^.+@.+$"
      - name: amount
        logicalType: integer
        logicalTypeOptions:
          minimum: 0
          maximum: 100
      - name: region
        logicalType: string
        required: true
"""


@pytest.fixture(scope="module")
def samples_run(spark):
    contract = load_contract_str(FAILED_SAMPLES_CONTRACT)
    return SparkContractEngine(spark, include_failed_samples=True).test(contract)


def test_no_samples_without_flag(spark):
    run = SparkContractEngine(spark).test(load_contract_str(FAILED_SAMPLES_CONTRACT))
    assert run.result is ResultEnum.failed
    assert all(c.failedSamples is None for c in run.checks)


def test_missing_samples_identifier_and_offending_column(samples_run):
    check = _find(samples_run, "field_required", "region")
    assert check.result is ResultEnum.failed
    assert {s["id"] for s in check.failedSamples} == {3, 5}
    for s in check.failedSamples:
        assert set(s.keys()) == {"id", "region"}
        assert s["region"] is None


def test_invalid_range_sample(samples_run):
    check = _find(samples_run, "field_maximum", "amount")
    assert check.failedSamples == [{"id": 3, "amount": 200}]


def test_samples_capped_at_five(samples_run):
    check = _find(samples_run, "field_regex", "email")
    assert len(check.failedSamples) == 5


def test_sensitive_column_omitted(samples_run):
    check = _find(samples_run, "field_regex", "email")
    for s in check.failedSamples:
        assert set(s.keys()) == {"id"}


def test_duplicate_samples_key_and_count(samples_run):
    check = _find(samples_run, "field_unique", "id")
    assert check.failedSamples == [{"id": 2, "duplicate_count": 2}]


# --- row filter fixture -------------------------------------------------------

def test_row_filter_fixture(spark):
    contract = load_contract(os.path.join(REF, "row-filter", "datacontract.yaml"))
    contract.servers[0].path = os.path.join(REF, "diagnostics", "data", "orders.csv")
    engine = SparkContractEngine(spark)
    filtered = engine.test(contract, filters=["order_id <= 2"])
    assert filtered.result is ResultEnum.passed  # rowCount mustBe 3 holds
    assert filtered.check("orders__row_count").diagnostics["value"] == 3
    unfiltered = engine.test(contract)
    assert unfiltered.result is ResultEnum.failed
