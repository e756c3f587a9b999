"""Catalog-identifier server binding — the exact code path an Iceberg
catalog would take (server type=iceberg resolves catalog.schema.model and
reads spark.read.table), exercised against managed tables in the built-in
spark_catalog since the Iceberg runtime jar is absent from this image
(documented impossibility: no network, no bundled jar)."""

import pytest

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.model.run import ResultEnum


CONTRACT = """
id: catalog-bind
version: 1.0.0
schema:
  - name: orders_cat
    properties:
      - name: id
        logicalType: integer
        required: true
        unique: true
      - name: status
        logicalType: string
        logicalTypeOptions:
          enum: [OPEN, CLOSED]
servers:
  - server: warehouse
    type: iceberg
    catalog: spark_catalog
    schema: catbind
"""


@pytest.fixture()
def managed_table(spark):
    spark.sql("CREATE DATABASE IF NOT EXISTS catbind")
    df = spark.createDataFrame(
        [(1, "OPEN"), (2, "CLOSED"), (3, "BOGUS"), (3, "OPEN")],
        "id int, status string")
    df.write.mode("overwrite").saveAsTable("catbind.orders_cat")
    yield
    spark.sql("DROP TABLE IF EXISTS catbind.orders_cat")
    spark.sql("DROP DATABASE IF EXISTS catbind")


def test_iceberg_style_catalog_binding(spark, managed_table):
    contract = load_contract_str(CONTRACT)
    run = SparkContractEngine(spark).test(contract)
    by = {c.key: c for c in run.checks}
    assert by["orders_cat__id__field_required"].result is ResultEnum.passed
    uniq = by["orders_cat__id__field_unique"]
    assert uniq.result is ResultEnum.failed and uniq.diagnostics["value"] == 1
    enum = by["orders_cat__status__field_enum"]
    assert enum.result is ResultEnum.failed and enum.diagnostics["value"] == 1


def test_missing_catalog_table_errors_cleanly(spark):
    contract = load_contract_str(CONTRACT.replace("orders_cat", "nonexistent_tbl"))
    run = SparkContractEngine(spark).test(contract)
    assert run.result is ResultEnum.error
    assert all(c.result is ResultEnum.error for c in run.checks)
    assert any("Could not bind server" in (c.reason or "") for c in run.checks)


def test_kafka_decode_path_without_connector(spark):
    """The kafka binding's decode half runs on a synthetic kafka-shaped
    frame (binary key/value/topic/partition/offset columns) — only the
    topic scan itself needs the absent connector jar."""
    import json

    from datacontract_cli_spark.model.contract import load_contract_str
    from datacontract_cli_spark.sources.readers import decode_kafka_batch

    contract = load_contract_str("""
id: kafka-shape
version: 1.0.0
schema:
  - name: events
    properties:
      - name: event_id
        logicalType: integer
        required: true
      - name: kind
        logicalType: string
""")
    msgs = [{"event_id": 1, "kind": "a"}, {"event_id": 2, "kind": None},
            {"event_id": None, "kind": "c"}]
    rows = [(b"k", json.dumps(m).encode(), "events", 0, i)
            for i, m in enumerate(msgs)]
    raw = spark.createDataFrame(
        rows, "key binary, value binary, topic string, partition int, offset long")
    decoded = decode_kafka_batch(raw, contract.schema_objects[0])
    assert decoded.columns == ["event_id", "kind"]
    assert [r.asDict() for r in decoded.orderBy("event_id").collect()] == [
        {"event_id": None, "kind": "c"},
        {"event_id": 1, "kind": "a"},
        {"event_id": 2, "kind": None},
    ]
    # engine runs on the decoded frame end-to-end
    run = SparkContractEngine(spark).test(contract, tables={"events": decoded})
    by = {c.key: c for c in run.checks}
    assert by["events__event_id__field_required"].result is ResultEnum.failed
    assert by["events__event_id__field_required"].diagnostics["value"] == 1
