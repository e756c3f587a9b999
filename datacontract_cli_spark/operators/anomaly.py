"""Robust numeric anomaly detection: median/MAD outlier counts.

A data-validation staple the reference expresses only through custom SQL
(quality blocks with handwritten thresholds): flag values whose robust
z-score |x - median| / (1.4826 · MAD) exceeds a cutoff (3.5 is the
standard Iglewicz-Hoban recommendation). Unlike mean/stddev rules, a
contaminated tail cannot drag the threshold toward itself.

Exactness vs scale: the gate lane uses Spark's exact interpolated
``percentile`` so a DuckDB ``quantile_cont`` oracle matches bit-for-bit.
Exact percentile buffers per-group values, which is fine for a single
column of doubles at any realistic shard size but is the wrong default
at 100 TB — pass ``approx=True`` there and the same plan runs on
``approx_percentile`` (t-digest style sketch, fixed memory, the same
machinery the KS drift lane uses).

Fully declarative: the median/MAD passes are 1-row aggregates
cross-joined back via broadcast — no driver-side collect between stages,
so the whole thing is ONE query Catalyst can schedule (3 sequential
scans; exact robust statistics are inherently multi-pass).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mad_outliers(df: DataFrame, column: str, z: float = 3.5,
                 approx: bool = False) -> DataFrame:
    """One row: median, mad, n_outliers, outlier_fraction for ``column``.

    Nulls are excluded from both the statistics and the denominator.
    """
    pct = "approx_percentile" if approx else "percentile"
    vals = df.filter(F.col(column).isNotNull()).select(F.col(column).alias("x"))
    med = vals.agg(F.expr(f"{pct}(x, 0.5)").alias("__med__"))
    mad = (vals.crossJoin(F.broadcast(med))
           .agg(F.expr(f"{pct}(abs(x - __med__), 0.5)").alias("__mad__"),
                F.first("__med__").alias("__med__")))
    cutoff = F.lit(z) * F.lit(1.4826) * F.col("__mad__")
    return (
        vals.crossJoin(F.broadcast(mad))
        .agg(
            F.round(F.first("__med__"), 6).alias("median"),
            F.round(F.first("__mad__"), 6).alias("mad"),
            F.sum(F.when(F.abs(F.col("x") - F.col("__med__")) > cutoff, 1)
                  .otherwise(0)).cast("bigint").alias("n_outliers"),
            F.round(
                F.sum(F.when(F.abs(F.col("x") - F.col("__med__")) > cutoff, 1)
                      .otherwise(0)) / F.count(F.lit(1)), 6
            ).alias("outlier_fraction"),
        )
    )
