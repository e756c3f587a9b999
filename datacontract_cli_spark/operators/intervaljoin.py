"""Interval (range) join: match right-side events whose timestamp falls in
a left-side [start, end) window, WITHOUT an equi-key.

The naive formulation (``left JOIN right ON r.ts >= l.start AND r.ts <
l.end``) has no equi-condition, so Spark plans a broadcast-nested-loop
join — O(|L|·|R|) comparisons, unusable at scale. This operator recovers a
hash join by time-bucketing (the standard interval-join shape, cf. Flink's
interval join and DuckDB/Spark range-join optimizations):

- each left row explodes into the epoch buckets its window spans
  (``ceil(window / bucket) + 1`` rows, a small constant for windows of the
  same order as the bucket);
- each right row computes its single bucket;
- an equi-join on the bucket co-partitions candidates, the exact
  ``[start, end)`` predicate filters them.

A right row lives in exactly one bucket and a left window contains each
bucket at most once, so matched pairs are emitted exactly once — no
dedup pass. The shuffle carries (bucket, payload) and AQE splits hot
buckets. Pick ``bucket_seconds`` ≈ the typical window length: larger
buckets fan left rows out less but let more non-matches through to the
filter; smaller buckets do the reverse.

Reference scope note: the reference engine has no join operators at all
(SURVEY §2.9) — this is a beyond-reference operator for the training-data
pipeline lane (event-window attribution, co-occurrence mining).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_start: str,
    left_end: str,
    right_ts: str,
    bucket_seconds: int = 300,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``right`` into the [left_start, left_end) window of each
    ``left`` row. Column name collisions must be resolved by the caller.
    Inner join only: a left-outer variant cannot be expressed per-bucket
    (a window is unmatched only if ALL its buckets are — callers wanting
    unmatched windows anti-join the anchors against the inner result)."""
    if how != "inner":
        raise ValueError(f"unsupported join type: {how}")
    b = F.lit(bucket_seconds * 1_000_000)  # epoch micros per bucket

    def _micros(name: str):
        # unix_micros takes TIMESTAMP only; parquet event times arrive as
        # TIMESTAMP_NTZ — the cast is session-tz-consistent on both sides of
        # the join, so bucket boundaries line up
        return F.unix_micros(F.col(name).cast("timestamp"))

    start_b = (_micros(left_start) / b).cast("long")
    # end is exclusive: a window ending exactly on a bucket boundary does not
    # reach into that bucket
    end_b = ((_micros(left_end) - F.lit(1)) / b).cast("long")
    # empty windows (end <= start) keep one bucket — F.sequence would
    # otherwise generate a DESCENDING range; the exact predicate below
    # filters every candidate of an empty window anyway
    lhs = left.withColumn(
        "__bucket__", F.explode(F.sequence(start_b, F.greatest(end_b, start_b))))
    rhs = right.withColumn(
        "__bucket__",
        (F.unix_micros(F.col(right_ts).cast("timestamp")) / b).cast("long"))
    matched = (F.col(right_ts) >= F.col(left_start)) & \
              (F.col(right_ts) < F.col(left_end))
    return lhs.join(rhs, "__bucket__").filter(matched).drop("__bucket__")


def window_count(
    events: DataFrame,
    anchor_filter: str,
    match_filter: str,
    ts_col: str = "ts",
    id_col: str = "event_id",
    window_seconds: int = 120,
    bucket_seconds: int = 60,
) -> DataFrame:
    """Per anchor event, the number of matching events in the
    ``window_seconds`` after it — e.g. clicks within 2 minutes of each
    purchase, across ALL users (no equi-key: the bucketed interval join is
    what keeps this off the nested-loop path)."""
    anchors = events.filter(F.expr(anchor_filter)).select(
        F.col(id_col).alias("anchor_id"),
        F.col(ts_col).alias("w_start"),
        (F.col(ts_col) + F.expr(f"INTERVAL {window_seconds} SECOND")).alias("w_end"),
    )
    matches = events.filter(F.expr(match_filter)).select(
        F.col(ts_col).alias("m_ts"))
    pairs = interval_join(anchors, matches, "w_start", "w_end", "m_ts",
                          bucket_seconds=bucket_seconds)
    return pairs.groupBy("anchor_id").agg(F.count(F.lit(1)).alias("n_matches"))
