"""The reference's quality fixture (tests/fixtures/quality/datacontract.yaml):
library metrics + postgres-dialect custom SQL with window functions and
placeholders, run by OUR engine on DataFrames seeded like the reference's
data.valid.sql (reference test: tests/test_test_quality.py)."""

import datetime as dt
import os

import pytest

from datacontract_cli_spark.checks.dialect import to_spark_sql
from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract
from datacontract_cli_spark.model.run import ResultEnum

REF = "/root/reference/tests/fixtures/quality/datacontract.yaml"

pytestmark = pytest.mark.skipif(not os.path.exists(REF),
                                reason="reference fixtures not available")

VALID_CODES = ["CX-263-DU", "IK-894-MN", "ER-399-JY", "MT-939-FH", "LV-849-MI",
               "VS-079-OH", "DN-297-XY", "ZE-172-FP", "ID-840-EG", "FK-230-KZ"]


def _valid_df(spark):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (code, 10_000 + 3_000 * i, base + dt.timedelta(minutes=10 * i))
        for i, code in enumerate(VALID_CODES)
    ]
    return spark.createDataFrame(
        rows, "field_one string, field_two bigint, field_three timestamp")


def test_reference_quality_contract_passes_on_valid_data(spark):
    contract = load_contract(REF)
    run = SparkContractEngine(spark).test(
        contract, tables={"my_table": _valid_df(spark)})
    failed = [(c.key, c.result.value, c.reason) for c in run.checks
              if c.result not in (ResultEnum.passed,)]
    assert failed == [], failed

    # the dialect shim handled percentile_cont + EXTRACT(EPOCH FROM …)
    pctl = run.check("my_table__field_two__quality_sql_0")
    assert pctl.diagnostics["value"] is not None
    assert 1000 <= pctl.diagnostics["value"] <= 49900
    max_dur = run.check("my_table__quality_sql_0")
    assert max_dur.diagnostics["value"] == 600.0  # 10-minute gaps


def test_reference_quality_contract_fails_on_invalid_data(spark):
    contract = load_contract(REF)
    df = _valid_df(spark).limit(3)  # rowCount > 9 violated; also gaps intact
    run = SparkContractEngine(spark).test(contract, tables={"my_table": df})
    assert run.result is ResultEnum.failed
    assert run.check("my_table__row_count").result is ResultEnum.failed


def test_dialect_rewrites():
    assert to_spark_sql(
        "SELECT percentile_cont(0.95) WITHIN GROUP (ORDER BY x) FROM t"
    ) == "SELECT percentile(x, 0.95) FROM t"
    assert to_spark_sql(
        "SELECT percentile_cont(0.1) WITHIN GROUP (ORDER BY x DESC) FROM t"
    ) == "SELECT percentile(x, 0.9) FROM t"
    out = to_spark_sql("SELECT EXTRACT(EPOCH FROM (a - b)) FROM t")
    assert "unix_millis(CAST(a AS TIMESTAMP))" in out
    assert "unix_millis(CAST(b AS TIMESTAMP))" in out
    out2 = to_spark_sql(
        "SELECT EXTRACT(EPOCH FROM (field_three - LAG(field_three) OVER (ORDER BY field_three))) FROM t")
    assert "LAG(field_three) OVER (ORDER BY field_three)" in out2
    assert out2.count("unix_millis") == 2
    assert to_spark_sql("SELECT x::int FROM t", "postgres") == "SELECT CAST(x AS int) FROM t"
    assert to_spark_sql("SELECT now()") == "SELECT current_timestamp()"
