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


_ASOF_TS = "__asof_matched_ts__"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Optional[str] = None,
    value_cols: Optional[List[str]] = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_seconds: Optional[float] = None,
) -> DataFrame:
    """Left as-of join (pandas merge_asof semantics, distributed).

    direction="backward" (default): latest right row with right.on <=
    left.on per ``by``; "forward": earliest right row with right.on >=
    left.on. ``tolerance_seconds`` nulls the match when the matched right
    timestamp is further than the tolerance from left.on (exactly
    merge_asof's ``tolerance``).

    One union + one segmented prefix-scan window per ``by`` group — the
    match is a running last-non-null fill, so each group streams through
    its partition once; no range join, no per-row Python."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"unsupported direction: {direction}")
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    left_cols = left.columns

    l_tag = left.withColumn(_SIDE, F.lit(1))
    for c in value_cols:
        new = f"{c}{suffix}" if c in left_cols else c
        l_tag = l_tag.withColumn(new, F.lit(None).cast(dict(right.dtypes)[c]))
    l_tag = l_tag.withColumn(_ASOF_TS, F.lit(None).cast(dict(left.dtypes)[on]))
    out_vals = [f"{c}{suffix}" if c in left_cols else c for c in value_cols]

    r_tag = right.select(
        *([F.col(by)] if by else []),
        F.col(on),
        F.lit(0).alias(_SIDE),
        F.col(on).alias(_ASOF_TS),
        *[F.col(c).alias(f"{c}{suffix}" if c in left_cols else c) for c in value_cols],
    )
    for c in left_cols:
        if c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))

    unioned = l_tag.unionByName(r_tag)
    order = (F.col(on).asc() if direction == "backward" else F.col(on).desc())
    w = (
        Window.partitionBy(*( [by] if by else [] ))
        .orderBy(order, F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *left_cols,
        F.col(_SIDE),
        F.last(F.col(_ASOF_TS), ignorenulls=True).over(w).alias(_ASOF_TS),
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in out_vals],
    )
    out = filled.filter(F.col(_SIDE) == 1).drop(_SIDE)
    if tolerance_seconds is not None:
        gap = (F.unix_micros(F.col(on).cast("timestamp"))
               - F.unix_micros(F.col(_ASOF_TS).cast("timestamp")))
        if direction == "forward":
            gap = -gap
        within = gap <= F.lit(int(tolerance_seconds * 1_000_000))
        out = out.select(
            *left_cols, F.col(_ASOF_TS),
            *[F.when(within, F.col(c)).otherwise(F.lit(None)).alias(c)
              for c in out_vals],
        )
    return out.drop(_ASOF_TS)


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


def asof_join_salted(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: Optional[str] = None,
    value_cols: Optional[List[str]] = None,
    suffix: str = "_right",
    n_buckets: int = 32,
) -> DataFrame:
    """Skew-safe as-of join: a segmented prefix-scan over time-range buckets.

    The plain window formulation sorts each ``by`` group in ONE task, so a
    hot key (one conversation holding 30% of all rows) serializes on a
    single core (measured 3.2x degradation in tools/skew_bench.py). This
    variant splits every group into ``n_buckets`` time ranges:

    1. rows bucket by value range of ``on`` (width_bucket over global
       min/max — one cheap scalar aggregate),
    2. the carry-forward window partitions by (by, bucket) — the hot key
       now spreads over ``n_buckets`` tasks,
    3. each bucket's carry-in (the last non-null right value of all EARLIER
       buckets) comes from a per-(by, bucket) map-side-combinable aggregate
       plus a tiny window over at most ``n_buckets`` rows per key,
    4. a join on the salted (by, bucket) key merges the carry-in; the same
       key salting that fixes the window fixes this join.

    Same semantics as :func:`asof_join` (latest right row with
    right.on <= left.on per group; right sorts before left on equal ``on``;
    ties among right rows at the same ``on`` resolve arbitrarily, as in the
    window formulation).
    """
    value_cols = value_cols or [c for c in right.columns if c not in (on, by)]
    left_cols = left.columns
    rdtypes = dict(right.dtypes)

    l_tag = left.withColumn(_SIDE, F.lit(1))
    for c in value_cols:
        new = f"{c}{suffix}" if c in left_cols else c
        l_tag = l_tag.withColumn(new, F.lit(None).cast(rdtypes[c]))
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

    # 1. global time range -> uniform buckets (double space handles
    # numeric and timestamp ``on`` uniformly)
    ond = F.col(on).cast("double")
    lo, hi = unioned.agg(F.min(ond), F.max(ond)).collect()[0]
    if lo is None or lo == hi:
        n_buckets = 1
    bucket = (F.lit(1) if n_buckets == 1 else
              F.width_bucket(ond, F.lit(float(lo)), F.lit(float(hi) + 1e-9),
                             F.lit(n_buckets)))
    b_tag = unioned.withColumn("__asof_b__", bucket)

    # 2. intra-bucket carry-forward (salted window: partition (by, bucket))
    w = (
        Window.partitionBy(*([by] if by else []), "__asof_b__")
        .orderBy(F.col(on).asc(), F.col(_SIDE).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    intra = b_tag.select(
        *left_cols, F.col(_SIDE), F.col("__asof_b__"),
        *[F.last(F.col(c), ignorenulls=True).over(w).alias(c) for c in out_vals],
    )

    # 3. per-bucket last non-null right value -> carry-in from earlier
    # buckets. Aggregated over ALL rows (left included) so every populated
    # (by, bucket) gets a carry row — a bucket holding only left rows must
    # still receive the carry-in from earlier buckets; its own aggregate is
    # null (the max_by key is null for left rows) and last(ignorenulls)
    # skips it.
    per_bucket = b_tag.groupBy(*([by] if by else []), "__asof_b__").agg(*[
        F.max_by(F.col(c), F.when((F.col(_SIDE) == 0) & F.col(c).isNotNull(),
                                  F.col(on))).alias(c)
        for c in out_vals
    ])
    wb = (
        Window.partitionBy(*([by] if by else []))
        .orderBy(F.col("__asof_b__").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    carry = per_bucket.select(
        *([by] if by else []), F.col("__asof_b__"),
        *[F.last(F.col(c), ignorenulls=True).over(wb).alias(f"__ci_{c}__")
          for c in out_vals],
    )

    # 4. merge carry-in on the salted key and prefer the intra-bucket value
    join_keys = ([by] if by else []) + ["__asof_b__"]
    merged = intra.join(carry, join_keys, "left").select(
        *left_cols, F.col(_SIDE),
        *[F.coalesce(F.col(c), F.col(f"__ci_{c}__")).alias(c) for c in out_vals],
    )
    return merged.filter(F.col(_SIDE) == 1).drop(_SIDE)
