"""Regression tests for the late-round-5 review findings: URI-encoded
_metadata.file_path vs raw DV/delete paths, the column-mapping guard on
the file-incremental lane, arrow-kernel null tolerance, and maintain's
flags-before-side-effects validation."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.operators import similarity
from datacontract_cli_spark.sources.delta_table import (
    delete_rows_delta,
    plan_delta,
    read_delta,
    write_delta_table,
)
from datacontract_cli_spark.sources.iceberg_table import read_iceberg
from datacontract_cli_spark.sources.iceberg_write import (
    delete_rows_iceberg,
    write_iceberg_table,
)


def test_delta_dv_in_percent_encoded_path(spark, tmp_path):
    """_metadata.file_path is a URI (space → %20); the DV join and
    delete_rows_delta's relpath math must see the RAW path or deleted
    rows resurface / the delete crashes with KeyError."""
    root = str(tmp_path / "my table")  # space forces percent-encoding
    df = spark.range(20).selectExpr("id", "id % 3 as grp")
    write_delta_table(df, root)
    delete_rows_delta(spark, root, "id % 2 = 0")
    out = read_delta(spark, root)
    assert out.count() == 10
    assert out.filter(F.col("id") % 2 == 0).count() == 0


def test_iceberg_mor_in_plus_path(spark, tmp_path):
    """'+' must survive the decode (url_decode alone would turn it into
    a space and un-match every positional delete)."""
    root = str(tmp_path / "ice+tbl v2")
    df = spark.range(20).selectExpr("id", "id % 3 as grp")
    write_iceberg_table(df, root)
    delete_rows_iceberg(spark, root, "id % 2 = 0")
    out = read_iceberg(spark, root)
    assert out.count() == 10
    assert out.filter(F.col("id") % 2 == 0).count() == 0


def test_incremental_refuses_column_mapping(spark, tmp_path):
    """The file-incremental lane reads raw parquet by LOGICAL name; on a
    column-mapped table (physical col-<uuid> names) every column would
    silently read as NULL — it must refuse instead."""
    from datacontract_cli_spark.checks.spec import (
        CheckSpec,
        MetricType,
        Op,
        Threshold,
    )
    from datacontract_cli_spark.engine.incremental import IncrementalValidator

    root = str(tmp_path / "mapped")
    df = spark.range(10).selectExpr("id", "cast(id as string) as name")
    write_delta_table(df, root, column_mapping="name")
    # sanity: the batch reader handles the mapping fine
    assert read_delta(spark, root).count() == 10
    spec = CheckSpec(key="rows", category="schema", type="t", name="rows",
                     model="m", field=None, metric=MetricType.ROW_COUNT,
                     threshold=Threshold(Op.EQ, 0))
    iv = IncrementalValidator(spark, str(tmp_path / "ckpt"))
    with pytest.raises(NotImplementedError, match="column mapping"):
        iv.run_delta(root, [spec], "m")


def test_arrow_lsh_kernel_tolerates_null_and_ragged(spark):
    """Null / wrong-length embeddings: the expr kernel maps them to a
    null bucket that never joins; the arrow kernel must skip them the
    same way instead of crashing the matmul."""
    rng = np.random.default_rng(11)
    a = rng.standard_normal(8)
    rows = [(1, a.tolist()), (2, (a * 2.0).tolist()),
            (3, None), (4, rng.standard_normal(5).tolist())]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = similarity.embedding_near_duplicates(
        df, threshold=0.99, nbits=6, dim=8, kernel="arrow").collect()
    assert {(r["id_a"], r["id_b"]) for r in pairs} == {(1, 2)}


DELTA_P3_CONTRACT = """
id: p3
version: 1.0.0
schema:
  - name: rows
    properties:
      - name: id
        logicalType: integer
        required: true
        unique: true
      - name: grp
        logicalType: integer
        logicalTypeOptions:
          maximum: 2
servers:
  - server: local
    type: delta
    path: "{path}"
"""


def test_contract_engine_over_protocol3_delta_server(spark, tmp_path):
    """The §2 delta-scan row without the jar, protocol 3 edition: a
    COLUMN-MAPPED table with live DELETION VECTORS binds through the
    server switch (pure-Python fallback) and the engine's verdicts see
    the post-delete surviving rows under logical names."""
    from datacontract_cli_spark.engine.executor import SparkContractEngine
    from datacontract_cli_spark.model.contract import load_contract_str
    from datacontract_cli_spark.model.run import ResultEnum

    root = str(tmp_path / "p3tbl")
    df = spark.range(30).selectExpr("cast(id as long) id",
                                    "cast(id % 3 as long) grp")
    write_delta_table(df, root, column_mapping="name")
    delete_rows_delta(spark, root, "id % 2 = 0")  # 15 survivors

    contract = load_contract_str(DELTA_P3_CONTRACT.format(path=root))

    # the binding itself sees the post-delete surviving rows under
    # LOGICAL column names (the table stores physical col-<uuid> names)
    from datacontract_cli_spark.sources.readers import bind_server_with_raw
    tables, _ = bind_server_with_raw(spark, contract, contract.servers[0])
    bound = tables["rows"]
    assert set(bound.columns) >= {"id", "grp"}
    assert bound.count() == 15
    assert bound.filter("id % 2 = 0").count() == 0

    run = SparkContractEngine(spark).test(contract)
    # grp max 2 holds; required/unique pass on the surviving set
    assert run.result in (ResultEnum.passed, ResultEnum.warning), \
        [(c.key, c.result, c.reason) for c in run.checks
         if c.result is ResultEnum.failed]


def test_maintain_rejects_bad_flag_combo_before_any_work(spark, tmp_path,
                                                         capsys):
    """`maintain --format delta --compact --expire-keep` must exit 1
    WITHOUT committing the compaction first."""
    from datacontract_cli_spark.cli import main

    root = str(tmp_path / "dtbl")
    df = spark.range(10).selectExpr("id", "id % 2 as grp")
    write_delta_table(df, root)
    state, _ = plan_delta(root)
    v_before = state["version"]

    assert main(["maintain", root, "--format", "delta", "--compact",
                 "--expire-keep", "2"]) == 1
    assert "iceberg-only" in capsys.readouterr().err
    state, _ = plan_delta(root)
    assert state["version"] == v_before  # no OPTIMIZE commit landed

    assert main(["maintain", root, "--format", "iceberg",
                 "--vacuum"]) == 1
    assert "delta-only" in capsys.readouterr().err
