"""Referential integrity as a distributed anti-join.

Not present in the reference engine (joins are reachable there only through
user SQL — SURVEY.md §2.9); the north rule requires conv_id referential
integrity across models, which maps to Spark's left-anti join.

Scale notes: the parent side is reduced to distinct keys first (shrinks the
build side by orders of magnitude on fact tables); when the distinct key set
is small Spark broadcasts it (helped by the explicit hint), so the child
table — the 100 TB side — is never shuffled. For parent key sets too large
to broadcast, AQE falls back to a sort-merge join with skew splitting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def orphan_rows(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> DataFrame:
    """Rows of ``child`` whose non-null ``child_col`` has no match in
    ``parent.parent_col``."""
    keys = parent.select(F.col(parent_col).alias("__dc_ref_key__")).distinct()
    return (
        child.filter(F.col(child_col).isNotNull())
        .join(F.broadcast(keys), on=F.col(child_col) == F.col("__dc_ref_key__"), how="left_anti")
    )


def orphan_count(child: DataFrame, child_col: str, parent: DataFrame, parent_col: str) -> int:
    return orphan_rows(child, child_col, parent, parent_col).count()
