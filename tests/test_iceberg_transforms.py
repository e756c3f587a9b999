"""Iceberg partition transforms: spec-exact bucket[N] + truncate[W].

The bucket hash must match the Iceberg spec bit-for-bit (32-bit x86
Murmur3, seed 0, canonical byte forms) — that is what makes bucket
pruning correct against tables written by ANY Iceberg engine, and the
prescribed 10^12-turn layout (``bucket(N, conv_id)``) interoperable.
Hash test vectors are the published ones from the Iceberg spec's
Appendix B requirement table."""

import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.sources.iceberg_table import (
    load_table_metadata,
    plan_scan,
    read_iceberg,
)
from datacontract_cli_spark.sources.iceberg_transforms import (
    bucket_column,
    bucket_value,
    murmur3_32,
    murmur3_32_longs,
)
from datacontract_cli_spark.sources.iceberg_write import (
    append_iceberg,
    delete_rows_iceberg,
    write_iceberg_table,
)


# ---------------------------------------------------------------------------
# hash function
# ---------------------------------------------------------------------------

def test_spec_hash_vectors():
    """Iceberg spec Appendix B: hashInt(34) = hashLong(34) = 2017239379,
    hash("iceberg") = 1210000089, hash(decimal 14.20) = -500754589."""
    assert murmur3_32(struct.pack("<q", 34)) == 2017239379
    assert murmur3_32(b"iceberg") == 1210000089
    assert murmur3_32(int(1420).to_bytes(2, "big", signed=True)) \
        == -500754589


def test_vectorized_matches_scalar():
    rng = np.random.default_rng(7)
    vals = rng.integers(-2**62, 2**62, size=500)
    vec = murmur3_32_longs(vals)
    for v, h in zip(vals.tolist(), vec.tolist()):
        assert murmur3_32(struct.pack("<q", v)) == h


def test_bucket_value_semantics():
    assert bucket_value(None, 16, "long") is None
    assert bucket_value(34, 16, "long") == (2017239379 & 0x7FFFFFFF) % 16
    assert bucket_value("iceberg", 16, "string") \
        == (1210000089 & 0x7FFFFFFF) % 16
    # int and long of the same value agree (spec: shared canonical form)
    assert bucket_value(34, 8, "int") == bucket_value(34, 8, "long")


def test_bucket_column_temporal_rejected():
    with pytest.raises(NotImplementedError, match="temporal"):
        bucket_column("ts", 8, "timestamptz")


# ---------------------------------------------------------------------------
# bucketed tables
# ---------------------------------------------------------------------------

def _df(spark, n=2000):
    return spark.range(0, n).select(
        F.concat(F.lit("c"), (F.col("id") % 97)).alias("conv_id"),
        F.col("id").alias("turn_id"),
        F.concat(F.lit("t"), F.col("id")).alias("text"))


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("bkt") / "t")
    write_iceberg_table(_df(spark), root,
                        partition_by=["bucket(8, conv_id)"])
    return root


def test_bucket_spec_metadata(bucketed):
    spec = load_table_metadata(bucketed)["partition-specs"][0]["fields"]
    assert spec == [{"name": "conv_id_bucket", "transform": "bucket[8]",
                     "source-id": 1, "field-id": 1000}]


def test_bucket_round_trip_exact(spark, bucketed):
    got = sorted(map(tuple, read_iceberg(spark, bucketed).collect()))
    exp = sorted(map(tuple, _df(spark).collect()))
    assert got == exp


def test_bucket_pruning_equality(spark, bucketed):
    _, all_paths = plan_scan(bucketed)
    assert len(all_paths) == 8
    _, pruned = plan_scan(bucketed, filters=[("conv_id", "=", "c42")])
    assert len(pruned) == 1
    got = read_iceberg(spark, bucketed, filters=[("conv_id", "=", "c42")])
    exp = _df(spark).filter("conv_id = 'c42'")
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, exp.collect()))


def test_bucket_pruning_in_long(spark, tmp_path):
    root = str(tmp_path / "t")
    write_iceberg_table(_df(spark), root,
                        partition_by=["bucket(4, turn_id)"])
    _, pruned = plan_scan(root, filters=[("turn_id", "in", [5, 6])])
    assert len(pruned) <= 2
    assert read_iceberg(
        spark, root, filters=[("turn_id", "in", [5, 6])]).count() == 2


def test_append_lands_in_spec_buckets(spark, bucketed):
    """Appended rows follow the table's bucket spec, so pruning stays
    exact across snapshots — a misplaced row would make the pruned read
    diverge from the residual-filtered one."""
    append_iceberg(_df(spark).filter("conv_id = 'c42'").limit(5), bucketed)
    got = read_iceberg(spark, bucketed,
                       filters=[("conv_id", "=", "c42")]).count()
    exp = _df(spark).filter("conv_id = 'c42'").count() + 5
    assert got == exp
    _, pruned = plan_scan(bucketed, filters=[("conv_id", "=", "c42")])
    assert len(pruned) == 2  # one original bucket file + one appended


def test_null_bucket_values(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("a", 1), (None, 2), ("b", 3), (None, 4)], "k string, v int")
    write_iceberg_table(df, root, partition_by=["bucket(4, k)"])
    assert read_iceberg(spark, root).count() == 4
    got = read_iceberg(spark, root, filters=[("k", "=", "a")])
    assert [tuple(r) for r in got.collect()] == [("a", 1)]


def test_truncate_int_floors_negatives(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.range(-10, 10).select(F.col("id").alias("v"),
                                     F.lit("x").alias("s"))
    write_iceberg_table(df, root, partition_by=["truncate(4, v)"])
    assert read_iceberg(spark, root).count() == 20
    # -9 lives in the [-12, -8) partition (floor, not C-style trunc)
    _, pruned = plan_scan(root, filters=[("v", "=", -9)])
    _, allp = plan_scan(root)
    assert len(pruned) < len(allp)
    assert read_iceberg(spark, root, filters=[("v", "=", -9)]).count() == 1


def test_truncate_string(spark, tmp_path):
    root = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("alpha", 1), ("alpine", 2), ("beta", 3)], "w string, v int")
    write_iceberg_table(df, root, partition_by=["truncate(4, w)"])
    spec = load_table_metadata(root)["partition-specs"][0]["fields"][0]
    assert spec["transform"] == "truncate[4]"
    _, pruned = plan_scan(root, filters=[("w", "=", "beta")])
    assert len(pruned) == 1
    assert read_iceberg(spark, root,
                        filters=[("w", "=", "beta")]).count() == 1


def test_bucket_with_merge_on_read(spark, tmp_path):
    """Bucket layout and MoR deletes compose: deletes scope correctly
    and pruned reads stay exact."""
    root = str(tmp_path / "t")
    write_iceberg_table(_df(spark, 500), root,
                        partition_by=["bucket(4, conv_id)"])
    delete_rows_iceberg(spark, root, "turn_id % 3 = 0")
    got = read_iceberg(spark, root, filters=[("conv_id", "=", "c7")])
    exp = _df(spark, 500).filter("conv_id = 'c7' AND turn_id % 3 != 0")
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, exp.collect()))


def test_bad_partition_spec_rejected(spark, tmp_path):
    with pytest.raises(ValueError, match="cannot parse"):
        write_iceberg_table(_df(spark, 10), str(tmp_path / "x"),
                            partition_by=["bucket(conv_id)"])
    with pytest.raises(ValueError, match="not in DataFrame"):
        write_iceberg_table(_df(spark, 10), str(tmp_path / "y"),
                            partition_by=["bucket(4, nope)"])
