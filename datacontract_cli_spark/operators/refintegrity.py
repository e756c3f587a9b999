"""Referential integrity as a distributed anti-join.

Not present in the reference engine (joins are reachable there only through
user SQL — SURVEY.md §2.9); the north rule requires conv_id referential
integrity across models, which maps to Spark's left-anti join.

Scale notes: the parent side is reduced to distinct keys first (shrinks the
build side by orders of magnitude on fact tables). Join strategy is left to
AQE by default: with runtime statistics it broadcasts the distinct key set
when it is actually small and falls back to a sort-merge join (with skew
splitting) when it is not. An unconditional ``F.broadcast`` hint would
override AQE and OOM executors on a high-cardinality parent (e.g. orders
keys for a lineitem-sized child), so the hint is only applied when the
caller explicitly promises the parent key set is broadcast-safe.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_rows(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    broadcast_parent: Optional[bool] = None,
) -> DataFrame:
    """Rows of ``child`` whose non-null ``child_col`` has no match in
    ``parent.parent_col``.

    broadcast_parent=None (default) lets AQE pick the join strategy from
    runtime stats; True forces a broadcast hint (caller asserts the distinct
    parent key set fits in executor memory); False forces shuffle hash/merge
    even if the optimizer would broadcast.
    """
    keys = parent.select(F.col(parent_col).alias("__dc_ref_key__")).distinct()
    if broadcast_parent is True:
        keys = F.broadcast(keys)
    elif broadcast_parent is False:
        keys = keys.hint("shuffle_hash")
    return (
        child.filter(F.col(child_col).isNotNull())
        .join(keys, on=F.col(child_col) == F.col("__dc_ref_key__"), how="left_anti")
    )


def orphan_count(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> int:
    return orphan_rows(child, child_col, parent, parent_col).count()


def fd_violations(df, lhs_cols, rhs_col):
    """Functional-dependency check: how many LHS groups map to MORE than
    one distinct RHS value (lhs -> rhs should be deterministic — e.g.
    nation key determines region key, order id determines customer id).

    One two-phase aggregate: groupBy(lhs).agg(count_distinct(rhs)); the
    shuffle carries one row per distinct (lhs, rhs) combination at most
    (map-side partial dedup), so clean data pays roughly a distinct scan.
    Returns a one-row frame (violating_groups, max_rhs_per_group)."""
    from pyspark.sql import functions as F

    grouped = (df.groupBy(*[F.col(c) for c in lhs_cols])
               .agg(F.count_distinct(F.col(rhs_col)).alias("__n_rhs__")))
    return grouped.agg(
        F.coalesce(F.sum(F.when(F.col("__n_rhs__") > 1, 1).otherwise(0)),
                   F.lit(0)).alias("violating_groups"),
        F.coalesce(F.max("__n_rhs__"), F.lit(0)).alias("max_rhs_per_group"))
