"""Pure-Python Delta log layer: replay, round-trip, pruning, time travel,
checkpoint, protocol guard, and the contract server fallback binding."""

import json
import os

import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.engine.executor import SparkContractEngine
from datacontract_cli_spark.model.contract import load_contract_str
from datacontract_cli_spark.model.run import ResultEnum
from datacontract_cli_spark.sources.delta_table import (
    checkpoint_delta,
    delta_versions,
    plan_delta,
    read_delta,
    write_delta_table,
)
from datacontract_cli_spark.sources.transcripts import synthesize_transcripts


def _rows(df):
    return sorted(str(sorted(r.asDict().items())) for r in df.collect())


@pytest.fixture(scope="module")
def table(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("delta") / "transcripts")
    df = synthesize_transcripts(spark, n_convs=30, turns_per_conv=5,
                                defect_rate=0.1)
    write_delta_table(df, root, partition_by=["role"])
    return root, df


def test_round_trip_exact(spark, table):
    root, df = table
    assert _rows(read_delta(spark, root)) == _rows(df)


def test_partition_and_stats_pruning(spark, table):
    root, df = table
    _, all_files = plan_delta(root)
    _, pruned = plan_delta(root, filters=[("role", "=", "assistant")])
    assert 0 < len(pruned) < len(all_files)
    got = read_delta(spark, root, filters=[("role", "=", "assistant")])
    assert got.count() == df.filter(F.col("role") == "assistant").count()
    # stats JSON bounds: turn_idx max is 4, so > 99 prunes every file
    _, none_left = plan_delta(root, filters=[("turn_idx", ">", 99)])
    assert none_left == []


def test_append_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "tt")
    df1 = synthesize_transcripts(spark, n_convs=8, turns_per_conv=4)
    df2 = synthesize_transcripts(spark, n_convs=4, turns_per_conv=4, seed=9)
    write_delta_table(df1, root, partition_by=["role"])
    write_delta_table(df2, root, mode="append")
    assert delta_versions(root) == [0, 1]
    assert read_delta(spark, root, version=0).count() == df1.count()
    assert _rows(read_delta(spark, root)) == _rows(df1.unionByName(df2))
    with pytest.raises(ValueError, match="version 7"):
        read_delta(spark, root, version=7)


def test_unpartitioned(spark, tmp_path):
    root = str(tmp_path / "flat")
    df = synthesize_transcripts(spark, n_convs=6, turns_per_conv=3)
    write_delta_table(df, root)
    assert _rows(read_delta(spark, root)) == _rows(df)


def test_checkpoint_covers_cleaned_log(spark, tmp_path):
    """After a checkpoint, the JSON commits it covers may be vacuumed —
    the reader must plan entirely from the checkpoint parquet (including
    MAP-typed partitionValues normalization)."""
    root = str(tmp_path / "cp")
    df1 = synthesize_transcripts(spark, n_convs=6, turns_per_conv=3)
    df2 = synthesize_transcripts(spark, n_convs=3, turns_per_conv=3, seed=2)
    write_delta_table(df1, root, partition_by=["role"])
    write_delta_table(df2, root, mode="append")
    v = checkpoint_delta(root)
    assert v == 1
    log = os.path.join(root, "_delta_log")
    for name in os.listdir(log):
        if name.endswith(".json"):
            os.remove(os.path.join(log, name))
    got = read_delta(spark, root)
    assert _rows(got) == _rows(df1.unionByName(df2))


def test_protocol_guard(spark, tmp_path):
    root = str(tmp_path / "dv")
    df = synthesize_transcripts(spark, n_convs=3, turns_per_conv=3)
    write_delta_table(df, root)
    log = os.path.join(root, "_delta_log")
    # reader version 3 with an UNKNOWN feature refuses honestly
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["variantType-preview"]}}) + "\n")
    with pytest.raises(NotImplementedError, match="variantType-preview"):
        read_delta(spark, root)
    # reader version 4 is beyond the supported surface
    with open(os.path.join(log, f"{2:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {"minReaderVersion": 4,
                                         "minWriterVersion": 7}}) + "\n")
    with pytest.raises(NotImplementedError, match="minReaderVersion 4"):
        read_delta(spark, root)
    # older version is still readable; v3 with only supported features too
    assert read_delta(spark, root, version=0).count() == df.count()
    with open(os.path.join(log, f"{3:020d}.json"), "w") as f:
        f.write(json.dumps({"protocol": {
            "minReaderVersion": 3, "minWriterVersion": 7,
            "readerFeatures": ["deletionVectors", "columnMapping"]}})
            + "\n")
    assert read_delta(spark, root, version=3).count() == df.count()


def test_remove_action_drops_files(spark, tmp_path):
    root = str(tmp_path / "rm")
    df = synthesize_transcripts(spark, n_convs=6, turns_per_conv=3)
    write_delta_table(df, root, partition_by=["role"])
    _, live = plan_delta(root)
    victim = live[0]
    log = os.path.join(root, "_delta_log")
    with open(os.path.join(log, f"{1:020d}.json"), "w") as f:
        f.write(json.dumps({"remove": {"path": victim["path"],
                                       "dataChange": True}}) + "\n")
    _, after = plan_delta(root)
    assert len(after) == len(live) - 1
    removed_rows = json.loads(victim["stats"])["numRecords"]
    assert read_delta(spark, root).count() == df.count() - removed_rows


DELTA_CONTRACT = """
id: transcripts-delta
version: 1.0.0
servers:
  - server: lake
    type: delta
    path: "{path}"
schema:
  - name: transcripts
    properties:
      - name: conv_id
        logicalType: string
        required: true
      - name: turn_idx
        logicalType: integer
      - name: role
        logicalType: string
        quality:
          - metric: invalidValues
            arguments:
              validValues: [system, user, assistant, tool]
            mustBe: 0
      - name: text
        logicalType: string
      - name: tool
        logicalType: string
      - name: ts
        logicalType: timestamp
"""


def test_contract_engine_over_delta_server(spark, table):
    """delta-spark jar is absent in this image: the server binding must
    fall back to the pure-Python log replay and still run every check."""
    root, df = table
    contract = load_contract_str(DELTA_CONTRACT.format(path=root))
    run = SparkContractEngine(spark).test(contract)
    chk = run.check("transcripts__role__field_invalid_values")
    n_bad = df.filter(
        ~F.col("role").isin("system", "user", "assistant", "tool")
        & F.col("role").isNotNull()).count()
    assert chk is not None and chk.diagnostics["value"] == n_bad
    assert run.check(
        "transcripts__conv_id__field_type").result is ResultEnum.passed


def test_import_contract_from_delta_dir(spark, table):
    from datacontract_cli_spark.sources.importers import import_delta_table

    root, _ = table
    contract = import_delta_table(root, table_name="transcripts")
    obj = contract.schema_objects[0]
    props = {p.name: p for p in obj.properties}
    assert set(props) == {"conv_id", "turn_idx", "role", "text", "tool",
                          "ts"}
    assert props["turn_idx"].logical_type == "integer"
    assert "role" in (obj.description or "")  # partition columns recorded
    srv = contract.servers[0]
    assert srv.type == "delta" and srv.path == root
    run = SparkContractEngine(spark).test(contract)
    assert run.check("transcripts__conv_id__field_type").result \
        is ResultEnum.passed


def test_import_cli_delta_dir(table, tmp_path):
    from datacontract_cli_spark.cli import main

    root, _ = table
    out = str(tmp_path / "imported.yaml")
    rc = main(["import", "--format", "delta", "--source", root,
               "--output", out])
    assert rc == 0
    import yaml
    doc = yaml.safe_load(open(out))
    assert doc["servers"][0]["type"] == "delta"
