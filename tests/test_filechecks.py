"""File/blob metadata checks (§2.8) over a real local directory through the
Hadoop FileSystem API — the storage-agnostic analogue of the reference's
Azure blob checks (check_azure_blob_file.py:69-446)."""

import pytest

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.model.run import ResultEnum
from datacontract_cli_spark.operators.filechecks import list_files


CONTRACT = """
id: blob-files
version: 1.0.0
schema:
  - name: exports
    logicalType: blob
    properties:
      - name: name
        logicalType: string
        required: true
        quality:
          - type: library
            arguments:
              pattern: "\\\\.csv$"
      - name: size
        logicalType: integer
        quality:
          - type: library
            mustBeGreaterThan: 0
          - type: library
            mustBeLessOrEqualTo: 1000
    quality:
      - type: library
        metric: fileCount
        mustBeGreaterOrEqualTo: 2
servers:
  - server: local
    type: local
    format: csv
    location: "{dir}"
"""


@pytest.fixture()
def blob_dir(tmp_path):
    (tmp_path / "a.csv").write_text("x," * 50)
    (tmp_path / "b.csv").write_text("y")
    (tmp_path / "notes.txt").write_text("hello")
    (tmp_path / "empty.csv").write_text("")
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "c.csv").write_text("z" * 10)
    return str(tmp_path)


def test_list_files_recursive(spark, blob_dir):
    files = list_files(spark, blob_dir)
    assert {f.name for f in files} == {"a.csv", "b.csv", "notes.txt", "empty.csv", "c.csv"}
    assert all(f.size >= 0 and f.lastModified is not None for f in files)
    only_csv = list_files(spark, blob_dir, pattern="*.csv")
    assert {f.name for f in only_csv} == {"a.csv", "b.csv", "empty.csv", "c.csv"}


def test_blob_schema_checks_end_to_end(spark, blob_dir):
    contract = load_contract_str(CONTRACT.replace("{dir}", blob_dir))
    run = SparkContractEngine(spark).test(contract)
    by_key = {c.key: c for c in run.checks}

    # name pattern: notes.txt violates .csv$
    name_q = by_key["exports__name__file_quality_0"]
    assert name_q.result is ResultEnum.failed
    assert "notes.txt" in name_q.reason

    # size > 0: empty.csv violates
    size_gt = by_key["exports__size__file_quality_0"]
    assert size_gt.result is ResultEnum.failed
    assert "empty.csv" in size_gt.reason

    # size <= 1000: all pass
    assert by_key["exports__size__file_quality_1"].result is ResultEnum.passed

    # required name: all files have names
    assert by_key["exports__name__file_required"].result is ResultEnum.passed

    # file count >= 2 passes (5 files)
    assert by_key["exports__file_count_0"].result is ResultEnum.passed


def test_blob_schema_missing_location(spark):
    contract = load_contract_str(CONTRACT.replace('location: "{dir}"', "path:"))
    run = SparkContractEngine(spark).test(contract)
    cfg = run.check("file_configuration")
    assert cfg is not None and cfg.result is ResultEnum.failed


def test_blob_schema_bad_location_is_error(spark):
    contract = load_contract_str(CONTRACT.replace("{dir}", "/nonexistent/nowhere"))
    run = SparkContractEngine(spark).test(contract)
    lst = run.check("exports__file_list")
    assert lst is not None and lst.result is ResultEnum.error


def test_lastmodified_iso_bound_and_bad_constraint(spark, blob_dir):
    contract = load_contract_str("""
id: blob-ts
version: 1.0.0
schema:
  - name: exports
    logicalType: blob
    properties:
      - name: lastModified
        logicalType: timestamp
        quality:
          - type: library
            mustBeGreaterThan: "2000-01-01T00:00:00"
          - type: library
            mustBeLessThan: "2000-01-01T00:00:00"
      - name: size
        logicalType: integer
        quality:
          - type: library
            mustBeGreaterThan: "not-a-number"
servers:
  - server: local
    type: local
    location: "{dir}"
""".replace("{dir}", blob_dir))
    run = SparkContractEngine(spark).test(contract)
    by = {c.key: c for c in run.checks}
    # ISO bound against real datetime metadata: files newer than 2000 pass >
    assert by["exports__lastModified__file_quality_0"].result is ResultEnum.passed
    assert by["exports__lastModified__file_quality_1"].result is ResultEnum.failed
    # incomparable bound -> error, not a crash
    assert by["exports__size__file_quality_0"].result is ResultEnum.error
