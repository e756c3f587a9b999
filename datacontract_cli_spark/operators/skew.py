"""Key-skew diagnostics: heavy hitters + per-key distribution summary.

The north rule requires conv_id skew to be "handled explicitly" — but you
can only handle what you can see. This operator is the seeing half: given
a grouping key, it reports the top-k heaviest keys with their share of
all rows and their ratio to the mean key size. A skew_ratio of 1 means a
perfectly even key; 1000 means that key's shuffle partition does 1000×
the average work and needs salting (`operators/asof.py` and the engine's
AQE skew-join config are the handling half).

Plan shape (one scan, one shuffle):

  groupBy(key).count()                    — the only wide exchange
    ├─ agg(sum, count, max)               — totals, 1 row
    └─ orderBy(n desc).limit(k)           — TakeOrderedAndProject
  top.crossJoin(broadcast(totals))        — both branches consume the
                                            SAME grouped subtree, so the
                                            exchange is built once and
                                            reused (ReusedExchange), the
                                            same sharing the validation
                                            engine uses for dup samples

At 100 TB: the shuffle carries (key, count) pairs only; the totals fold
and the top-k heaps are per-partition partials. Nothing here collects
more than k+1 rows.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def key_skew_report(df: DataFrame, keys: List[str], top_k: int = 10) -> DataFrame:
    """Top-k heaviest keys with share-of-rows and ratio-to-mean-key-size.

    Returns columns: *keys, n_rows, share (6dp), skew_ratio (4dp),
    ordered by n_rows desc then keys asc (deterministic).
    """
    counts = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("n_rows"))
    totals = counts.agg(
        F.sum("n_rows").alias("__total__"),
        F.count(F.lit(1)).alias("__n_keys__"),
    )
    top = counts.orderBy(F.desc("n_rows"),
                         *[F.asc(k) for k in keys]).limit(top_k)
    return (
        top.crossJoin(F.broadcast(totals))
        .select(
            *[F.col(k) for k in keys],
            F.col("n_rows"),
            F.round(F.col("n_rows") / F.col("__total__"), 6).alias("share"),
            # cast BEFORE multiplying: long*long wraps silently at the
            # 10^12-row scale this diagnostic targets (n_rows × n_keys can
            # exceed Long.MAX while each factor is fine)
            F.round(F.col("n_rows").cast("double") * F.col("__n_keys__")
                    / F.col("__total__"), 4).alias("skew_ratio"),
        )
        .orderBy(F.desc("n_rows"), *[F.asc(k) for k in keys])
    )
