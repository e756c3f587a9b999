"""Table diff: added / removed / changed / unchanged between two versions.

The validation question every migration, backfill, and pipeline rewrite
asks: "what exactly changed between yesterday's table and today's?" —
answered without ever shuffling full rows. Each side is reduced to
(key, row_fingerprint) where the fingerprint is one xxhash64 over the
compared columns; the FULL OUTER join then moves 16 bytes per row
instead of the row. A contract `test` tells you the new table is valid;
`table_diff` tells you it is the table you meant to produce.

Classification per key:
  key only in B            → added
  key only in A            → removed
  key in both, hash differs → changed
  key in both, hash equal   → unchanged

Exactness: xxhash64 collisions can only MISS a change (two different
rows hashing equal), never invent one, with probability ~n²/2⁶⁴ per key
— the standard fingerprint trade. ``exact=True`` compares the concatted
column values themselves (string-cast), for oracle parity and
paranoid runs; same plan shape, wider shuffle.

At 100 TB: two scans (one per side), one shuffle each keyed on the PK
carrying (key, 8-byte hash), AQE picks the join strategy; output is a
single summary row. Duplicate keys on either side are counted per key
pair (the join is on the key, not the hash), so a PK violation shows up
as inflated changed/unchanged counts — run the uniqueness check first.
"""

from __future__ import annotations

from typing import List, Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _fingerprint(df: DataFrame, keys: List[str],
                 compare_cols: Optional[List[str]], exact: bool) -> DataFrame:
    cols = compare_cols or [c for c in df.columns if c not in keys]
    if not cols:
        # key-only membership diff: no columns can differ, so every
        # both-present key is "unchanged" (xxhash64() with zero args is an
        # AnalysisException — the constant fingerprint expresses the same)
        fp = F.lit("").alias("x") if exact else F.lit(0).cast("bigint")
        return df.select(*[F.col(k) for k in keys], fp.alias("__dc_fp__"))
    # null-safe, order-fixed rendering with a NULL sentinel. In exact mode
    # each value is length-prefixed before joining: a bare separator would
    # alias ('a\x01b','c') with ('a','b\x01c') when string values contain
    # the separator — the length prefix makes the rendering injective.
    rendered = [F.coalesce(F.col(c).cast("string"), F.lit("\x00null"))
                for c in sorted(cols)]
    if exact:
        fp = F.concat_ws("\x01", *[
            F.concat(F.length(r).cast("string"), F.lit(":"), r)
            for r in rendered])
    else:
        fp = F.xxhash64(*rendered)
    return df.select(*[F.col(k) for k in keys], fp.alias("__dc_fp__"))


def table_diff(a: DataFrame, b: DataFrame, keys: List[str],
               compare_cols: Optional[List[str]] = None,
               exact: bool = False) -> DataFrame:
    """One row: n_added, n_removed, n_changed, n_unchanged (A → B)."""
    fa = _fingerprint(a, keys, compare_cols, exact)
    fb = _fingerprint(b, keys, compare_cols, exact)
    joined = fa.alias("a").join(
        fb.alias("b"),
        on=[F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}")) for k in keys],
        how="full_outer",
    )
    a_present = F.col("a.__dc_fp__").isNotNull() | F.col(f"a.{keys[0]}").isNotNull()
    b_present = F.col("b.__dc_fp__").isNotNull() | F.col(f"b.{keys[0]}").isNotNull()
    return joined.agg(
        F.sum(F.when(~a_present & b_present, 1).otherwise(0))
        .cast("bigint").alias("n_added"),
        F.sum(F.when(a_present & ~b_present, 1).otherwise(0))
        .cast("bigint").alias("n_removed"),
        F.sum(F.when(a_present & b_present
                     & (F.col("a.__dc_fp__") != F.col("b.__dc_fp__")), 1)
              .otherwise(0)).cast("bigint").alias("n_changed"),
        F.sum(F.when(a_present & b_present
                     & (F.col("a.__dc_fp__") == F.col("b.__dc_fp__")), 1)
              .otherwise(0)).cast("bigint").alias("n_unchanged"),
    )


def table_diff_rows(a: DataFrame, b: DataFrame, keys: List[str],
                    compare_cols: Optional[List[str]] = None,
                    kinds: Optional[List[str]] = None,
                    limit: int = 100, exact: bool = False) -> DataFrame:
    """The diff ROWS (key columns + kind), bounded and deterministic —
    the drill-down companion of ``table_diff``."""
    fa = _fingerprint(a, keys, compare_cols, exact)
    fb = _fingerprint(b, keys, compare_cols, exact)
    joined = fa.alias("a").join(
        fb.alias("b"),
        on=[F.col(f"a.{k}").eqNullSafe(F.col(f"b.{k}")) for k in keys],
        how="full_outer",
    )
    a_present = F.col("a.__dc_fp__").isNotNull() | F.col(f"a.{keys[0]}").isNotNull()
    b_present = F.col("b.__dc_fp__").isNotNull() | F.col(f"b.{keys[0]}").isNotNull()
    kind = (F.when(~a_present, F.lit("added"))
            .when(~b_present, F.lit("removed"))
            .when(F.col("a.__dc_fp__") != F.col("b.__dc_fp__"),
                  F.lit("changed"))
            .otherwise(F.lit("unchanged")))
    out = joined.select(
        *[F.coalesce(F.col(f"a.{k}"), F.col(f"b.{k}")).alias(k) for k in keys],
        kind.alias("kind"),
    )
    out = out.filter(F.col("kind").isin(kinds or ["added", "removed", "changed"]))
    return out.orderBy("kind", *[F.col(k) for k in keys]).limit(limit)


def diff_snapshots(spark, table_path: str, from_snapshot: int,
                   to_snapshot: Optional[int], keys: List[str],
                   compare_cols: Optional[List[str]] = None,
                   exact: bool = False) -> DataFrame:
    """Version diff of an Iceberg table between two of its own snapshots
    (``to_snapshot`` None = current) — time travel via the pure-Python
    manifest planner feeding the fingerprint full-outer join. The audit
    answer to "what changed between yesterday's validated snapshot and
    today's": added/removed/changed row counts without any external copy
    of the old version."""
    from datacontract_cli_spark.sources.iceberg_table import read_iceberg

    old = read_iceberg(spark, table_path, snapshot_id=from_snapshot)
    new = read_iceberg(spark, table_path, snapshot_id=to_snapshot)
    return table_diff(old, new, keys, compare_cols, exact)
