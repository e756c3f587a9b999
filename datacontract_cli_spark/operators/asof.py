"""As-of (point-in-time) join — Spark has no native one (SURVEY §2.9 /
pyspark guide "common OLAP patterns").

``asof_join(left, right, on, by)`` attaches to every left row the latest
right row with ``right.on <= left.on`` within the same ``by`` group.

Strategy (pure DataFrame ops, no Python in the row path):
union both sides tagged with a side marker, window-sort within each ``by``
group by (on, side), and carry the last right-side values forward with
``last(..., ignorenulls=True)``. One shuffle on ``by`` total — the same
cost as a plain grouped window, strictly cheaper than the bucketize+join+
filter alternative, and skew on ``by`` is handled by AQE the same way any
window is.

For unbounded ``by`` cardinality with monstrous groups, the
``asof_join_pandas`` variant does per-group ``pd.merge_asof`` via
applyInPandas (Arrow-batched).
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Optional[str] = None,
    value_cols: Optional[List[str]] = None,
    suffix: str = "_right",
) -> DataFrame:
    """Left as-of join: latest right row with right.on <= left.on (per by)."""
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    left_cols = left.columns

    l_tag = left.withColumn(_SIDE, F.lit(1))
    for c in value_cols:
        new = f"{c}{suffix}" if c in left_cols else c
        l_tag = l_tag.withColumn(new, F.lit(None).cast(dict(right.dtypes)[c]))
    out_vals = [f"{c}{suffix}" if c in left_cols else c for c in value_cols]

    r_tag = right.select(
        *([F.col(by)] if by else []),
        F.col(on),
        F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"{c}{suffix}" if c in left_cols else c) for c in value_cols],
    )
    for c in left_cols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tag.unionByName(r_tag)
    w = (
        Window.partitionBy(*( [by] if by else [] ))
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *left_cols,
        F.col(_SIDE),
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in out_vals],
    )
    return filled.filter(F.col(_SIDE) == 1).drop(_SIDE)


def asof_join_pandas(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: str,
    value_cols: Optional[List[str]] = None,
    suffix: str = "_right",
) -> DataFrame:
    """applyInPandas variant: per-by-group pd.merge_asof. Arrow-batched;
    use when groups are small and numerous."""
    import pandas as pd

    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    out_names = [f"{c}{suffix}" if c in left.columns else c for c in value_cols]
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in left.schema.fields]
        + [f"`{n}` {dict(right.dtypes)[c]}" for n, c in zip(out_names, value_cols)]
    )
    rdtypes = dict(right.dtypes)
    l2 = left.withColumn(_SIDE, F.lit(1))
    for c, n in zip(value_cols, out_names):
        l2 = l2.withColumn(f"__v_{n}__", F.lit(None).cast(rdtypes[c]))
    r2 = right.select(
        by, on, F.lit(0).alias(_SIDE),
        *[F.col(c).alias(f"__v_{n}__") for c, n in zip(value_cols, out_names)],
    )
    for c in l2.columns:
        if c not in r2.columns:
            r2 = r2.withColumn(c, F.lit(None).cast(dict(l2.dtypes)[c]))
    both = l2.unionByName(r2.select(*l2.columns))

    left_names = [c for c in left.columns]

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = pdf[pdf[_SIDE] == 1][left_names].sort_values(on)
        rpdf = pdf[pdf[_SIDE] == 0][[on] + [f"__v_{n}__" for n in out_names]].sort_values(on)
        rpdf = rpdf.rename(columns={f"__v_{n}__": n for n in out_names})
        if lpdf.empty:
            return pd.DataFrame(columns=left_names + out_names)
        merged = pd.merge_asof(lpdf, rpdf, on=on, direction="backward")
        return merged[left_names + out_names]

    return both.groupBy(by).applyInPandas(merge, out_schema)
