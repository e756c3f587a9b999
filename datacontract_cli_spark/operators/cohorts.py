"""Cohort retention analysis over an event stream.

The standard product-analytics rollup (and a drift-adjacent data-quality
signal: a retention curve that suddenly collapses usually means an
ingestion gap, not a product change): users are grouped into cohorts by
their first-activity period; retention at offset k is the fraction of a
cohort active k periods later.

Plan shape — three shuffles total, each on a bounded key:
  1. first-touch per user  (groupBy user — two-phase min aggregate)
  2. distinct (user, period) activity (two-phase distinct)
  3. cohort × offset distinct-user counts (two-phase count_distinct)
Cohort sizes are a tiny (n_periods-row) frame that broadcasts back for
the rate. Nothing is quadratic; the widest shuffle carries one row per
(user, period) pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohort_retention(events: DataFrame, user_col: str = "user_id",
                     ts_col: str = "ts", period: str = "week",
                     max_offset: int = 12, digits: int = 4) -> DataFrame:
    """(cohort, period_offset, n_active, cohort_size, retention) rows.

    ``period``: "day", "week" or "month" (offsets must be exact whole
    periods — day/week via date arithmetic, month via calendar months; a
    unit this function can't offset correctly is rejected rather than
    silently mis-bucketed). ``max_offset`` bounds the output width (and
    the join fan-out) — the tail beyond it is rarely plotted and never
    worth the rows."""
    if period not in ("day", "week", "month"):
        raise ValueError(f"period must be day/week/month, got {period!r}")
    per_days = {"day": 1, "week": 7}.get(period)
    cohort_of = F.date_trunc(period, F.col(ts_col))

    first = (events.groupBy(F.col(user_col).alias("u"))
             .agg(F.min(cohort_of).alias("cohort")))
    active = (events.select(F.col(user_col).alias("u"),
                            cohort_of.alias("p"))
              .distinct())
    joined = active.join(first, "u")
    if per_days is not None:
        offset = (F.datediff(F.col("p"), F.col("cohort"))
                  / F.lit(per_days)).cast("long")
    else:  # month: calendar difference, not day arithmetic
        offset = ((F.year("p") - F.year("cohort")) * 12
                  + (F.month("p") - F.month("cohort"))).cast("long")
    counts = (joined.withColumn("off", offset)
              .filter(F.col("off") <= max_offset)
              .groupBy("cohort", "off")
              # (u, p) is distinct and p -> off is injective per cohort, so
              # each user appears once per group: a plain count avoids the
              # two-exchange distinct-aggregate plan on the widest frame
              .agg(F.count(F.lit(1)).alias("n_active")))
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("cohort_size"))
    return (counts.join(F.broadcast(sizes), "cohort")
            .select(F.date_format("cohort", "yyyy-MM-dd").alias("cohort"),
                    F.col("off").alias("period_offset"),
                    "n_active", "cohort_size",
                    F.round(F.col("n_active") / F.col("cohort_size"), digits)
                    .alias("retention"))
            .orderBy("cohort", "period_offset"))
