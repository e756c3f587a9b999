"""As-of join skew evidence: window formulation vs salted segmented
prefix-scan, uniform keys vs one key holding `hot` of all rows.

Reproduces the numbers in BENCH/BASELINE.md §"As-of join under conv/user
skew". Usage: python tools/asof_skew_bench.py [n_left] [hot_fraction]
Prints one JSON line; does not rewrite BASELINE.md.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def med(fn, n=4):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return round(statistics.median(ts[1:]), 2)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    hot = float(sys.argv[2]) if len(sys.argv) > 2 else 0.3

    from pyspark.sql import functions as F

    from datacontract_cli_spark.operators.asof import asof_join, asof_join_salted
    from datacontract_cli_spark.session import get_spark

    spark = get_spark("asofskew", master="local[32]", shuffle_partitions=32)

    def build(hot_frac):
        left = spark.range(n).select(
            F.when(F.rand(1) < hot_frac, F.lit("hot")).otherwise(
                F.concat(F.lit("u"), (F.col("id") % 5000).cast("string"))).alias("user"),
            (F.rand(2) * 1e6).alias("t"), F.col("id").alias("lid"))
        right = spark.range(n // 10).select(
            F.when(F.rand(3) < hot_frac, F.lit("hot")).otherwise(
                F.concat(F.lit("u"), (F.col("id") % 5000).cast("string"))).alias("user"),
            (F.rand(4) * 1e6).alias("t"), F.rand(5).alias("val"))
        return left.persist(), right.persist()

    out = {"n_left": n, "hot": hot}
    for frac, tag in ((0.0, "uniform"), (hot, "skewed")):
        left, right = build(frac)
        left.count(), right.count()
        out[f"window_{tag}"] = med(
            lambda: asof_join(left, right, on="t", by="user")
            .agg(F.count("val")).collect())
        out[f"salted_{tag}"] = med(
            lambda: asof_join_salted(left, right, on="t", by="user", n_buckets=32)
            .agg(F.count("val")).collect())
        left.unpersist(), right.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
