"""Skew evidence (north rule: conv_id skew handled explicitly).

Measures per-conversation checks on a uniform table vs a table where ONE
conv_id holds ~30% of all turns:

1. algebraic per-conv stats (groupBy + count/min/max) — skew-immune by
   construction: map-side partial aggregation collapses the hot
   conversation inside each input split before any shuffle.
2. window-based turn-ordering check (Window.partitionBy(conv_id)) — the hot
   conversation sorts in ONE task; degrades with hot share.
3. adjacency-join formulation of the same ordering check
   (operators/convchecks.non_monotonic_ts_count_join) — the join key
   includes turn_idx, so the hot conversation spreads over all reducers;
   flat under skew. This is the engine's scale path.

Appends a section to BENCH/BASELINE.md.
Usage: python tools/skew_bench.py [n_convs] [turns_per_conv] [hot_fraction]
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
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    turns = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    hot = float(sys.argv[3]) if len(sys.argv) > 3 else 0.3
    n_turns = n_convs * turns

    from pyspark.sql import functions as F

    from datacontract_cli_spark.operators.convchecks import (
        non_monotonic_ts_count,
        non_monotonic_ts_count_join,
    )
    from datacontract_cli_spark.session import get_spark
    from datacontract_cli_spark.sources.transcripts import synthesize_transcripts

    spark = get_spark("skew", master="local[32]", shuffle_partitions=64)

    def table(fraction):
        tag = f"transcripts_skewB_{n_convs}x{turns}_{fraction}"
        path = os.path.join(REPO, ".bench_data", tag)
        if not os.path.exists(path):
            synthesize_transcripts(spark, n_convs=n_convs, turns_per_conv=turns,
                                   hot_conv_fraction=fraction, partitions=128
                                   ).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    uni, skew = table(0.0), table(hot)
    hot_share = skew.filter(F.col("conv_id") == "conv-0000000000").count() / n_turns

    def alg(df):
        return lambda: (df.groupBy("conv_id")
                        .agg(F.count(F.lit(1)).alias("n"),
                             F.min("turn_idx"), F.max("turn_idx"))
                        .agg(F.max("n")).collect())

    r = {
        "n_turns": n_turns, "hot_share": round(hot_share, 3),
        "alg_uniform": med(alg(uni)), "alg_skewed": med(alg(skew)),
        "window_uniform": med(lambda: non_monotonic_ts_count(uni).collect()),
        "window_skewed": med(lambda: non_monotonic_ts_count(skew).collect()),
        "join_uniform": med(lambda: non_monotonic_ts_count_join(uni).collect()),
        "join_skewed": med(lambda: non_monotonic_ts_count_join(skew).collect()),
    }
    print(json.dumps(r))

    section = f"""

## Skew evidence: per-conversation checks under a hot conv_id

{n_turns:,} turns, uniform vs ONE conversation holding {hot_share:.0%} of all
rows; local[32], median of 3 warm runs:

| per-conversation check | uniform | skewed ({hot_share:.0%} hot) |
|---|---|---|
| algebraic stats (groupBy count/min/max) | {r['alg_uniform']}s | {r['alg_skewed']}s |
| turn-ordering via Window.partitionBy(conv_id) | {r['window_uniform']}s | {r['window_skewed']}s |
| turn-ordering via adjacency join (engine's scale path) | {r['join_uniform']}s | {r['join_skewed']}s |

Algebraic checks are skew-immune by construction (map-side partial
aggregation collapses the hot conversation before the shuffle) — the engine
deliberately expresses its per-conversation checks this way
(operators/convchecks.py). Ordering checks that need a per-conversation
sort DO degrade under skew in the window formulation (one task owns the hot
conversation); the adjacency-join formulation keys on (conv_id, turn_idx),
spreading the hot conversation across every reducer — flat under skew, and
the gap grows with hot share (the window's hot task is O(hot_share × table)).

Reproduce: `python tools/skew_bench.py {n_convs} {turns} {hot}`
"""
    path_md = os.path.join(REPO, "BENCH", "BASELINE.md")
    prior = open(path_md).read() if os.path.exists(path_md) else ""
    marker = "\n## Skew evidence"
    if marker in prior:
        # replace ONLY this section: everything up to the marker, plus
        # whatever sections FOLLOW it (truncating the tail would destroy
        # the as-of / per-query / data-size sections appended later)
        head, rest = prior.split(marker, 1)
        nxt = rest.find("\n## ")
        tail = rest[nxt:] if nxt != -1 else ""
        prior = head.rstrip() + "\n" + section + tail
        with open(path_md, "w") as f:
            f.write(prior)
    else:
        with open(path_md, "w") as f:
            f.write(prior + section)


if __name__ == "__main__":
    main()
