"""Regression tests for the round-5 self-review findings: spec-exact
uuid/decimal hashing and bounds, moved-table commits, null snapshot_id
inheritance, successive MoR deletes, sliced-validation missing columns,
and literal line separators.

Reference parity: the reference CLI binds Iceberg through pyiceberg,
whose transforms/bounds follow the same Iceberg spec appendices these
tests pin (Appendix B hash vectors, Appendix D single-value bounds)."""

import json
import os
import shutil
import struct

import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.sources.iceberg_table import (
    decode_bound,
    encode_bound,
    read_iceberg,
)
from datacontract_cli_spark.sources.iceberg_transforms import (
    bucket_value,
    min_twos_complement,
    murmur3_32,
    uuid_bytes,
)
from datacontract_cli_spark.sources.iceberg_write import (
    append_iceberg,
    delete_equality_iceberg,
    delete_rows_iceberg,
    write_iceberg_table,
)


# ---------------------------------------------------------------------------
# Iceberg spec Appendix B hash vectors (uuid raw bytes, decimal minimal
# two's-complement) + Appendix D bounds
# ---------------------------------------------------------------------------

def test_uuid_hashes_as_16_raw_bytes():
    # spec vector: f79c3e09-677c-4bbd-a479-3f349cb785e7 -> 1488055340
    u = "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    assert murmur3_32(uuid_bytes(u)) == 1488055340
    # the string rendering hashes differently — the old (wrong) behavior
    assert murmur3_32(u.encode()) != 1488055340


def test_decimal_minimal_twos_complement():
    # spec vector: decimal 14.20 (unscaled 1420) -> -500754589
    assert murmur3_32(min_twos_complement(1420)) == -500754589
    # Java BigInteger.toByteArray parity on the -2^(8k-1) edge
    assert min_twos_complement(-128) == b"\x80"
    assert min_twos_complement(128) == b"\x00\x80"
    assert min_twos_complement(-1) == b"\xff"
    assert min_twos_complement(0) == b"\x00"
    assert min_twos_complement(-129) == b"\xff\x7f"


def test_bucket_value_uuid_and_decimal():
    u = "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    assert bucket_value(u, 16, "uuid") == (1488055340 & 0x7FFFFFFF) % 16
    import uuid as _uuid
    assert bucket_value(_uuid.UUID(u), 16, "uuid") == \
        bucket_value(u, 16, "uuid")
    # decimal buckets over the unscaled value via the minimal encoding
    assert bucket_value(1420, 0x7FFFFFFF, "decimal(9,2)") == \
        (-500754589) & 0x7FFFFFFF
    assert bucket_value(-128, 8, "decimal(9,0)") == \
        (murmur3_32(b"\x80") & 0x7FFFFFFF) % 8


def test_uuid_bound_roundtrip():
    u = "f79c3e09-677c-4bbd-a479-3f349cb785e7"
    data = encode_bound("uuid", u)
    assert len(data) == 16  # raw bytes, not the 36-char string
    assert decode_bound("uuid", data) == u


# ---------------------------------------------------------------------------
# moved table: commits after a relocation must stay self-consistent
# ---------------------------------------------------------------------------

def test_commit_on_moved_table(spark, tmp_path):
    old = str(tmp_path / "old" / "t")
    new = str(tmp_path / "new" / "t")
    df1 = spark.range(0, 100).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("a-"), F.col("id")).alias("text"))
    write_iceberg_table(df1, old)
    shutil.move(old, new)

    # append at the new location: prior manifest-list is recorded with the
    # OLD absolute path — the commit must rebase it, and carry prior
    # manifests rewritten so the table is self-consistent at `new`
    df2 = spark.range(100, 130).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("b-"), F.col("id")).alias("text"))
    append_iceberg(df2, new)
    got = read_iceberg(spark, new)
    assert got.count() == 130
    assert got.filter("doc_id < 100").count() == 100

    # and a MoR delete on the moved-then-appended table
    delete_rows_iceberg(spark, new, "doc_id % 10 = 0")
    assert read_iceberg(spark, new).count() == 130 - 13

    # nothing in the new metadata references the old root
    meta_dir = os.path.join(new, "metadata")
    vs = sorted(f for f in os.listdir(meta_dir) if f.endswith(".json"))
    meta = json.load(open(os.path.join(meta_dir, vs[-1])))
    assert meta["location"].rstrip("/") == os.path.abspath(new)


def test_second_positional_delete(spark, tmp_path):
    root = str(tmp_path / "t2")
    df = spark.range(0, 200).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 3).cast("int").alias("grp"))
    write_iceberg_table(df, root, files_per_group=3)
    delete_rows_iceberg(spark, root, "doc_id % 7 = 0")     # 29 rows
    n1 = read_iceberg(spark, root).count()
    assert n1 == 200 - 29
    # a SECOND positional delete — previously raised NotImplementedError
    # because planning went through the copy-on-write surface
    delete_rows_iceberg(spark, root, "doc_id % 11 = 0")
    got = read_iceberg(spark, root)
    expect = [i for i in range(200) if i % 7 != 0 and i % 11 != 0]
    assert sorted(r["doc_id"] for r in got.collect()) == expect
    # and a third after an equality delete
    delete_equality_iceberg(
        spark, root, spark.createDataFrame([(1,)], "grp int"), ["grp"])
    delete_rows_iceberg(spark, root, "doc_id % 13 = 0")
    expect = [i for i in expect if i % 3 != 1 and i % 13 != 0]
    assert sorted(r["doc_id"]
                  for r in read_iceberg(spark, root).collect()) == expect


# ---------------------------------------------------------------------------
# foreign-table manifest entries: null snapshot_id inherits
# added_snapshot_id, so old files resolve their WRITE-TIME schema
# ---------------------------------------------------------------------------

def test_null_snapshot_id_inherits_write_schema(spark, tmp_path):
    from datacontract_cli_spark.sources.avro_ocf import read_ocf, write_ocf
    from datacontract_cli_spark.sources.iceberg_write import (
        evolve_schema_iceberg,
    )

    root = str(tmp_path / "t3")
    df = spark.range(0, 50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("t-"), F.col("id")).alias("text"))
    write_iceberg_table(df, root)
    evolve_schema_iceberg(root, rename={"text": "body"})

    # simulate a real engine's manifests: ADDED entries leave snapshot_id
    # null (inherited from the manifest's added_snapshot_id)
    meta_dir = os.path.join(root, "metadata")
    for f in os.listdir(meta_dir):
        if f.endswith(".avro") and "manifest-list" not in f:
            p = os.path.join(meta_dir, f)
            schema, entries = read_ocf(p)
            for e in entries:
                e["snapshot_id"] = None
            write_ocf(p, schema, entries)

    got = read_iceberg(spark, root)
    rows = got.orderBy("doc_id").collect()
    # the renamed column must be mapped by field id, not read all-NULL
    assert rows[0]["body"] == "t-0"
    assert all(r["body"] is not None for r in rows)


# ---------------------------------------------------------------------------
# sliced validation: missing column surfaces as FAILING, never dropped
# ---------------------------------------------------------------------------

def test_sliced_validation_missing_column_fails(spark):
    from datacontract_cli_spark.engine.sliced import sliced_validation
    from datacontract_cli_spark.model.contract import load_contract_str

    contract = load_contract_str("""
id: t
version: 1.0.0
schema:
  - name: m
    properties:
      - name: grp
        logicalType: integer
      - name: lang
        logicalType: string
        required: true
""")
    # the bound frame LOST the 'lang' column (schema drift)
    df = spark.range(0, 10).select(
        (F.col("id") % 2).cast("int").alias("grp"))
    out = sliced_validation(df, contract, "m", ["grp"]).collect()
    lang_rows = [r for r in out if "lang" in r["check_key"]]
    assert lang_rows, "missing-column check must still be reported"
    assert all(r["passed"] is False for r in lang_rows)
    assert all(r["metric_value"] is None for r in lang_rows)


# ---------------------------------------------------------------------------
# line dedup: sep is literal, not a regex
# ---------------------------------------------------------------------------

def test_line_dedup_literal_separator(spark):
    from datacontract_cli_spark.operators.lines import line_dedup

    df = spark.createDataFrame(
        [("a", "one. two. three"), ("b", "two. four")],
        "doc_id string, text string")
    out = {r["doc_id"]: r for r in
           line_dedup(df, sep=". ", min_len=1).collect()}
    # sep='. ' must split into sentences, not on every character
    assert out["a"]["n_lines"] == 3
    assert out["b"]["n_lines"] == 2
    # 'two' duplicated: first occurrence (doc a) kept, doc b's dropped
    assert out["a"]["text_clean"] == "one. two. three"
    assert out["b"]["n_dropped"] == 1
    assert out["b"]["text_clean"] == "four"
