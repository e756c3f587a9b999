"""Sensitive-column exclusion from failed samples (reference:
ibis_check_execute.py:371-410 — PII-classified columns are dropped)."""

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.model.run import ResultEnum


def test_sensitive_columns_dropped_from_samples(spark):
    c = load_contract_str("""
id: pii
version: 0.1.0
schema:
  - name: users
    properties:
      - name: user_id
        logicalType: integer
        primaryKey: true
        required: true
      - name: email
        logicalType: string
        classification: sensitive
        required: true
      - name: age
        logicalType: integer
        logicalTypeOptions:
          minimum: 0
""")
    df = spark.createDataFrame(
        [(1, "a@x.com", 30), (2, None, -5), (3, "c@x.com", 40)],
        "user_id bigint, email string, age bigint",
    )
    run = SparkContractEngine(spark, include_failed_samples=True).test(
        c, tables={"users": df})

    # email is the offending column AND sensitive → sample keeps only the id
    miss = run.check("users__email__field_required")
    assert miss.result is ResultEnum.failed
    assert miss.failedSamples == [{"user_id": 2}]

    # age violation sample includes id + age but never the sensitive email
    age = run.check("users__age__field_minimum")
    assert age.result is ResultEnum.failed
    assert age.failedSamples == [{"user_id": 2, "age": -5}]
    assert all("email" not in s for s in age.failedSamples)
