"""Z-order (Morton-curve) clustering for compaction.

``OPTIMIZE ... ZORDER BY (a, b)`` in Delta Lake / Iceberg's
``rewrite_data_files(strategy => 'sort', sort_order => 'zorder(a, b)')``
rewrite data files so that rows close in the MULTI-dimensional key space
land in the same file: each column is rank-bucketized (quantile
boundaries, so skew cannot starve buckets), the bucket bits are
interleaved into a Morton code, and files are cut along contiguous code
ranges. Every file then covers a tight min/max range on EVERY z-column
simultaneously, so file-stats pruning works for predicates on any of
them — a linear sort gives that for the leading column only.

Spark-first: the z-value is pure Column math (indicator sums over
literal quantile boundaries + bit interleave), the file cut is
``repartitionByRange`` + ``sortWithinPartitions`` — one shuffle, no UDF,
no driver data. At 100 TB the only added cost over bin-packing is that
range shuffle, which the rewrite needed anyway to cut files.

Reference parity: datacontract-cli delegates OPTIMIZE/ZORDER to
delta-spark; this is the same clustering contract, self-contained.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERICISH = (T.ByteType, T.ShortType, T.IntegerType, T.LongType,
               T.FloatType, T.DoubleType, T.DecimalType, T.DateType,
               T.TimestampType, T.TimestampNTZType)


def _as_double(df: DataFrame, col: str) -> Column:
    # DATE has no direct double cast in Spark; go through timestamp
    # (TIMESTAMP → DOUBLE is epoch seconds, order-preserving)
    dt = df.schema[col].dataType
    # DATE and TIMESTAMP_NTZ have no direct double cast; both go through
    # TIMESTAMP (epoch seconds, order-preserving — only rank buckets are
    # needed here, not exact values)
    if isinstance(dt, (T.DateType, T.TimestampNTZType)):
        return F.col(col).cast("timestamp").cast("double")
    return F.col(col).cast("double")


def zorder_boundaries(df: DataFrame, cols: Sequence[str],
                      bits: int = 4) -> Dict[str, List[float]]:
    """Per-column quantile boundaries splitting each column into
    ``2**bits`` rank buckets (approx, 1% relative error — bucket edges
    need not be exact for clustering to work; pruning correctness comes
    from the written files' real min/max stats, never from these)."""
    n = 1 << bits
    probs = [i / n for i in range(1, n)]
    out: Dict[str, List[float]] = {}
    for c in cols:
        f = df.schema[c]
        if not isinstance(f.dataType, _NUMERICISH):
            raise ValueError(
                f"zorder column {c!r} has type {f.dataType.simpleString()};"
                " only numeric/date/timestamp columns are supported")
        qs = df.select(_as_double(df, c).alias(c)).na.drop() \
               .approxQuantile(c, probs, 0.01)
        out[c] = qs
    return out


def zvalue_column(df: DataFrame, boundaries: Dict[str, List[float]],
                  cols: Sequence[str], bits: int = 4) -> Column:
    """The Morton code: bucket each column by its boundaries (a sum of
    ``col > boundary`` indicators — monotone, null-safe: nulls land in
    bucket 0), then interleave bucket bits across columns so one long
    orders the multi-dimensional key space. ``df`` supplies the column
    types so the comparison casts match the boundary computation."""
    buckets = []
    for c in cols:
        b = F.lit(0).cast("long")
        for edge in boundaries[c]:
            b = b + F.when(_as_double(df, c) > F.lit(float(edge)),
                           F.lit(1)).otherwise(F.lit(0)).cast("long")
        buckets.append(b)
    ncols = len(cols)
    z = F.lit(0).cast("long")
    for i in range(bits):
        for j, b in enumerate(buckets):
            bit = F.shiftright(b, i).bitwiseAND(F.lit(1))
            z = z + bit * F.lit(1 << (i * ncols + j))
    return z


def cluster_by_zorder(df: DataFrame, cols: Sequence[str],
                      target_files: int, bits: int = 4,
                      boundaries: Optional[Dict[str, List[float]]] = None
                      ) -> DataFrame:
    """``df`` re-arranged so a plain ``.write.parquet`` emits
    ``target_files`` files, each covering one contiguous Morton-code
    range: range-partition on the z-value, sort within each partition,
    drop the helper column (projection preserves the row order)."""
    if boundaries is None:
        boundaries = zorder_boundaries(df, cols, bits)
    z = zvalue_column(df, boundaries, cols, bits)
    return (df.withColumn("__zv", z)
              .repartitionByRange(max(1, int(target_files)), F.col("__zv"))
              .sortWithinPartitions("__zv")
              .drop("__zv"))
