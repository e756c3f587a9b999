"""Z-order (Morton) compaction: multi-column file clustering so stats
pruning works on EVERY z-column, not just a sort-leading one.

Reference parity: delta-spark's OPTIMIZE ... ZORDER BY / Iceberg's
rewrite_data_files sort strategy — the reference CLI inherits them from
its connector; here the clustering is implemented Spark-first
(quantile-bucket Morton codes + repartitionByRange, zorder.py)."""

import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.sources.delta_table import (
    compact_delta,
    plan_delta,
    read_delta,
    write_delta_table,
)
from datacontract_cli_spark.sources.iceberg_table import (
    plan_scan_entries,
    read_iceberg,
)
from datacontract_cli_spark.sources.iceberg_write import (
    compact_iceberg,
    write_iceberg_table,
)
from datacontract_cli_spark.sources.zorder import (
    cluster_by_zorder,
    zorder_boundaries,
    zvalue_column,
)

N = 40_000


def _xy(spark):
    # x and y decorrelated: a file range on x says nothing about y
    # unless the layout is z-ordered
    return spark.range(N).select(
        F.col("id"),
        (F.col("id") % 200).alias("x"),
        ((F.col("id") * 7919) % 200).alias("y"),
    )


def test_zvalue_orders_both_dimensions(spark):
    df = spark.createDataFrame(
        [(0.0, 0.0), (0.0, 199.0), (199.0, 0.0), (199.0, 199.0)],
        "x double, y double")
    b = {"x": [50.0, 100.0, 150.0], "y": [50.0, 100.0, 150.0]}
    vals = [r[0] for r in df.select(
        zvalue_column(df, b, ["x", "y"], bits=2)).collect()]
    # (0,0) lowest, (max,max) highest, mixed corners strictly between
    assert vals[0] < vals[1] and vals[0] < vals[2]
    assert vals[3] > vals[1] and vals[3] > vals[2]


def test_zorder_rejects_string_columns(spark):
    df = spark.createDataFrame([("a", 1)], "s string, x long")
    with pytest.raises(ValueError, match="only numeric"):
        zorder_boundaries(df, ["s"])


def test_zorder_date_column(spark, tmp_path):
    """DATE has no direct double cast in Spark — the advertised
    date support must route through timestamp and actually cluster."""
    df = spark.range(2000).selectExpr(
        "id", "date_add(date'2024-01-01', cast(id % 365 as int)) as d",
        "(id * 7919) % 100 as y")
    root = str(tmp_path / "dtbl")
    write_delta_table(df, root)
    compact_delta(spark, root, zorder_by=["d", "y"], target_files=8)
    got = read_delta(spark, root).count()
    assert got == 2000
    _, live = plan_delta(root)
    _, ld = plan_delta(root, filters=[("y", "<", 10)])
    assert len(ld) < len(live)


def test_zorder_timestamp_ntz_column(spark):
    """TIMESTAMP_NTZ is whitelisted in _NUMERICISH but has no direct double
    cast in Spark — it must route through timestamp like DATE, not raise
    AnalysisException (ADVICE r5)."""
    df = spark.range(200).selectExpr(
        "id",
        "timestampadd(HOUR, cast(id as int), "
        "  cast('2024-01-01T00:00:00' as timestamp_ntz)) as t")
    bounds = zorder_boundaries(df, ["t"], bits=2)
    assert len(bounds["t"]) == 3
    assert bounds["t"] == sorted(bounds["t"])


def test_cluster_by_zorder_file_count_and_rows(spark):
    df = _xy(spark)
    out = cluster_by_zorder(df, ["x", "y"], target_files=16)
    assert out.rdd.getNumPartitions() == 16
    assert out.count() == N
    assert out.columns == df.columns  # helper column dropped


def _pruning_ratio(live_counter, total):
    return 1.0 - live_counter / total


def test_delta_zorder_prunes_both_columns(spark, tmp_path):
    root = str(tmp_path / "dtbl")
    write_delta_table(_xy(spark), root)
    v = compact_delta(spark, root, zorder_by=["x", "y"], target_files=16)
    assert v == 1
    _, live = plan_delta(root)
    total = len(live)
    assert total >= 12  # the rewrite actually cut multiple files

    # a narrow predicate on EITHER column prunes most files
    _, lx = plan_delta(root, filters=[("x", "<", 12)])
    _, ly = plan_delta(root, filters=[("y", "<", 12)])
    assert len(lx) <= total // 2, (len(lx), total)
    assert len(ly) <= total // 2, (len(ly), total)

    # and results stay exact
    got = read_delta(spark, root, filters=[("y", "<", 12)]).count()
    exp = _xy(spark).filter(F.col("y") < 12).count()
    assert got == exp
    # maintenance semantics preserved: OPTIMIZE commit, same rows
    assert read_delta(spark, root).count() == N


def test_iceberg_zorder_prunes_both_columns(spark, tmp_path):
    root = str(tmp_path / "itbl")
    write_iceberg_table(_xy(spark), root)
    compact_iceberg(spark, root, files_per_group=16, zorder_by=["x", "y"])
    _, entries = plan_scan_entries(root)
    total = len(entries)
    assert total >= 12

    _, ex = plan_scan_entries(root, filters=[("x", "<", 12)])
    _, ey = plan_scan_entries(root, filters=[("y", "<", 12)])
    assert len(ex) <= total // 2, (len(ex), total)
    assert len(ey) <= total // 2, (len(ey), total)

    got = read_iceberg(spark, root, filters=[("y", "<", 12)]).count()
    exp = _xy(spark).filter(F.col("y") < 12).count()
    assert got == exp
    assert read_iceberg(spark, root).count() == N


def test_cli_maintain_zorder(spark, tmp_path, capsys):
    import json as _json

    from datacontract_cli_spark.cli import main

    root = str(tmp_path / "dtbl")
    write_delta_table(_xy(spark), root)

    assert main(["maintain", root, "--format", "delta",
                 "--zorder-by", "x,y"]) == 1  # requires --compact
    assert "requires --compact" in capsys.readouterr().err

    assert main(["maintain", root, "--format", "delta", "--compact",
                 "--zorder-by", "x,y"]) == 0
    rep = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rep["compacted_version"] == 1
    _, lx = plan_delta(root, filters=[("x", "<", 12)])
    _, live = plan_delta(root)
    assert len(lx) < len(live)
