"""Quality-rule machinery: percent thresholds, severity downgrade, custom
SQL with placeholders + window functions, library metrics, check filtering
(reference: tests/fixtures/quality/datacontract.yaml semantics)."""

import pytest

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.model.run import ResultEnum
from datacontract_cli_spark.sources.transcripts import synthesize_transcripts

CONTRACT = """
id: quality-rules
version: 0.1.0
schema:
  - name: transcripts
    properties:
      - name: conv_id
        logicalType: string
      - name: turn_idx
        logicalType: integer
      - name: role
        logicalType: string
        quality:
          - metric: nullValues
            mustBeLessOrEqualTo: 30
            unit: percent
            id: role-null-pct
          - metric: invalidValues
            arguments:
              validValues: [system, user, assistant, tool]
            mustBe: 0
            severity: warning
            id: role-enum-soft
            tags: [drift]
      - name: text
        logicalType: string
    quality:
      - type: library
        metric: rowCount
        mustBeGreaterThan: 10
      - type: sql
        description: p95 turn_idx via window function
        query: >
          SELECT percentile(turn_idx, 0.95) FROM {model}
        mustBeLessThan: 100
      - type: sql
        description: max gap between consecutive turns per conv
        query: >
          SELECT max(gap) FROM (
            SELECT turn_idx - LAG(turn_idx) OVER
              (PARTITION BY conv_id ORDER BY turn_idx) AS gap
            FROM {model})
        mustBeLessOrEqualTo: 1
      - type: custom
        engine: soda
        implementation: "legacy sodacl"
"""


@pytest.fixture(scope="module")
def run(spark):
    contract = load_contract_str(CONTRACT)
    df = synthesize_transcripts(spark, n_convs=100, turns_per_conv=6, defect_rate=0.2)
    return SparkContractEngine(spark).test(contract, tables={"transcripts": df})


def test_percent_threshold(run):
    c = run.check("transcripts__role__field_null_values")
    assert c.result is ResultEnum.passed  # ~5% nulls <= 30%
    assert c.diagnostics["unit"] == "percent"
    assert 0 < c.diagnostics["percent"] < 30
    assert c.diagnostics["row_count"] == 600


def test_severity_downgrades_to_warning(run):
    c = run.check("transcripts__role__field_invalid_values")
    assert c.result is ResultEnum.warning  # violations exist but severity=warning
    assert c.diagnostics["value"] > 0
    assert c.qualityId == "role-enum-soft"
    assert c.tags == ["drift"]


def test_custom_sql_percentile(run):
    c = run.check("transcripts__quality_sql_1")
    assert c.result is ResultEnum.passed
    assert c.diagnostics["value"] < 100


def test_custom_sql_window_function(run):
    c = run.check("transcripts__quality_sql_2")
    # defect data collapses some turn_idx to 1 → gaps can exceed 1
    assert c.result in (ResultEnum.passed, ResultEnum.failed)
    assert c.diagnostics["value"] is not None
    assert c.implementation and "LAG" in c.implementation


def test_legacy_soda_custom_is_warned(run):
    c = run.check("transcripts__quality_custom_3")
    assert c.result is ResultEnum.warning
    assert "no longer supported" in c.reason


def test_run_not_failed_by_warnings_alone(spark):
    contract = load_contract_str("""
id: softonly
version: 0.1.0
schema:
  - name: transcripts
    properties:
      - name: role
        logicalType: string
        quality:
          - metric: nullValues
            mustBe: 0
            severity: info
""")
    df = synthesize_transcripts(spark, n_convs=50, turns_per_conv=4, defect_rate=0.3)
    run = SparkContractEngine(spark).test(contract, tables={"transcripts": df})
    assert run.check("transcripts__role__field_null_values").result is ResultEnum.warning
    assert run.result is ResultEnum.warning


def test_quality_id_filter(spark):
    contract = load_contract_str(CONTRACT)
    df = synthesize_transcripts(spark, n_convs=20, turns_per_conv=4)
    engine = SparkContractEngine(spark)
    run = engine.test(contract, tables={"transcripts": df}, quality_id="role-null-pct")
    assert len(run.checks) == 1
    assert run.checks[0].qualityId == "role-null-pct"
    run2 = engine.test(contract, tables={"transcripts": df}, tag="drift")
    assert len(run2.checks) == 1
    assert run2.checks[0].key == "transcripts__role__field_invalid_values"


def test_dimension_filter(spark):
    contract = load_contract_str(CONTRACT)
    df = synthesize_transcripts(spark, n_convs=20, turns_per_conv=4)
    run = SparkContractEngine(spark).test(contract, tables={"transcripts": df},
                                          dimension="completeness")
    assert run.checks == []  # none of these checks default to completeness
