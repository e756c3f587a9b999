"""Round-3 pipeline operators: interval join (key-free range join),
connected components (dedup clusters), deterministic stratified sampling
and hash splits."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.operators import dedup
from datacontract_cli_spark.operators.intervaljoin import interval_join, window_count
from datacontract_cli_spark.operators.sampling import hash_split, stratified_sample


def _ts(minute, second=0):
    return dt.datetime(2024, 1, 1, 0, minute, second)


def test_interval_join_exact_pairs(spark):
    anchors = spark.createDataFrame(
        [(1, _ts(0), _ts(2)), (2, _ts(10), _ts(12)), (3, _ts(20), _ts(22))],
        "aid int, w_start timestamp, w_end timestamp")
    events = spark.createDataFrame(
        [(100, _ts(0)),          # == start: inclusive
         (101, _ts(1, 59)),      # inside
         (102, _ts(2)),          # == end: exclusive
         (103, _ts(11)),         # inside window 2
         (104, _ts(30))],        # no window
        "eid int, ts timestamp")
    got = {(r["aid"], r["eid"]) for r in
           interval_join(anchors, events, "w_start", "w_end", "ts",
                         bucket_seconds=60).collect()}
    assert got == {(1, 100), (1, 101), (2, 103)}


def test_interval_join_no_duplicate_pairs_across_buckets(spark):
    # window spans many buckets; each match must appear exactly once
    anchors = spark.createDataFrame([(1, _ts(0), _ts(50))],
                                    "aid int, w_start timestamp, w_end timestamp")
    events = spark.createDataFrame([(i, _ts(i)) for i in range(0, 50, 7)],
                                   "eid int, ts timestamp")
    rows = interval_join(anchors, events, "w_start", "w_end", "ts",
                         bucket_seconds=60).collect()
    assert len(rows) == len({r["eid"] for r in rows}) == 8


def test_interval_join_no_nested_loop_in_plan(spark):
    anchors = spark.createDataFrame([(1, _ts(0), _ts(2))],
                                    "aid int, w_start timestamp, w_end timestamp")
    events = spark.createDataFrame([(1, _ts(1))], "eid int, ts timestamp")
    q = interval_join(anchors, events, "w_start", "w_end", "ts")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_interval_join_matches_naive_join(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    got = window_count(ev, "event_type = 'purchase'", "event_type = 'click'",
                       window_seconds=300, bucket_seconds=60)
    a = ev.filter("event_type = 'purchase'").select(
        F.col("event_id").alias("anchor_id"), F.col("ts").alias("a_ts"))
    b = ev.filter("event_type = 'click'").select(F.col("ts").alias("b_ts"))
    naive = (a.join(b, (F.col("b_ts") >= F.col("a_ts")) &
                    (F.col("b_ts") < F.col("a_ts") + F.expr("INTERVAL 300 SECOND")))
             .groupBy("anchor_id").agg(F.count(F.lit(1)).alias("n_matches")))
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, naive.collect()))


def test_interval_join_rejects_unknown_how(spark):
    df = spark.range(1).select(
        F.col("id"), F.current_timestamp().alias("s"),
        F.current_timestamp().alias("e"))
    with pytest.raises(ValueError):
        interval_join(df, df, "s", "e", "s", how="full")


# ---------------------------------------------------------------------------
# connected components
# ---------------------------------------------------------------------------

# both code paths must produce identical components: the single-task
# union-find fast path (small edge sets) and the distributed label
# propagation (forced via DCSPARK_CC_LOCAL_EDGES=0)
_CC_PATHS = ["local", "distributed"]


@pytest.fixture(params=_CC_PATHS)
def cc_path(request, monkeypatch):
    if request.param == "distributed":
        monkeypatch.setenv("DCSPARK_CC_LOCAL_EDGES", "0")
    return request.param


def test_connected_components_basic(spark, cc_path):
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "id_a long, id_b long")
    got = {r["node"]: r["cluster_id"]
           for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20, 23: 20}


def test_connected_components_long_chain(spark, cc_path):
    # a path graph exercises multi-round propagation
    n = 12
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n)],
                                  "id_a long, id_b long")
    got = dedup.connected_components(pairs).collect()
    assert {r["cluster_id"] for r in got} == {0}
    assert len(got) == n + 1


def test_connected_components_double_ids_rounding_adversary(spark, monkeypatch):
    """Double node ids must NOT use the decimal-sum convergence fast path:
    all these labels round to the same integer under decimal(38,0), so the
    label sum is invariant across rounds even while labels are still
    propagating — a sum-based test would declare convergence after round 1
    with a 3-way split of one true component (ADVICE r5). Forced onto the
    distributed path, where the sum shortcut lives."""
    monkeypatch.setenv("DCSPARK_CC_LOCAL_EDGES", "0")
    vals = [11.4, 11.2, 11.0, 10.8, 10.6]
    pairs = spark.createDataFrame(
        [(vals[i], vals[i + 1]) for i in range(len(vals) - 1)],
        "id_a double, id_b double")
    got = dedup.connected_components(pairs).collect()
    assert {r["cluster_id"] for r in got} == {10.6}
    assert len(got) == len(vals)


def test_connected_components_string_ids_long_chain(spark, cc_path):
    """Non-numeric node ids have no label sum — convergence must fall
    back to the changed-label join, and a chain still fully collapses
    (a premature fixed-point would stop after distance 2)."""
    n = 12
    pairs = spark.createDataFrame(
        [(f"doc{i:04d}", f"doc{i + 1:04d}") for i in range(n)],
        "id_a string, id_b string")
    got = dedup.connected_components(pairs).collect()
    assert {r["cluster_id"] for r in got} == {"doc0000"}
    assert len(got) == n + 1


def test_connected_components_releases_caches(spark):
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    before = len([r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()])
    out = dedup.connected_components(pairs)
    out.collect()
    after = len([r for r in spark.sparkContext._jsc.sc().getRDDStorageInfo()])
    # the final labels frame may stay cached, plus the edges
    # localCheckpoint blocks (lineage cut for expression-heavy pair
    # producers; released by the context cleaner on GC, not on scope exit)
    assert after - before <= 2


# ---------------------------------------------------------------------------
# sampling
# ---------------------------------------------------------------------------

def test_stratified_sample_quota_and_determinism(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s1 = stratified_sample(docs, "lang", 5, "doc_id").select("doc_id", "lang")
    s2 = stratified_sample(docs.repartition(7), "lang", 5, "doc_id") \
        .select("doc_id", "lang")
    r1 = sorted(map(tuple, s1.collect()))
    r2 = sorted(map(tuple, s2.collect()))
    assert r1 == r2, "sample must not depend on partitioning"
    per_lang = {}
    for _, lang in r1:
        per_lang[lang] = per_lang.get(lang, 0) + 1
    assert all(v <= 5 for v in per_lang.values())
    n_langs = docs.select("lang").distinct().count()
    assert len(per_lang) == n_langs


def test_hash_split_stable_and_complete(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = hash_split(docs, "doc_id", {"train": 0.8, "valid": 0.1, "test": 0.1})
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n")).collect()}
    total = docs.count()
    assert sum(counts.values()) == total
    assert counts["train"] > counts["valid"] and counts["train"] > counts["test"]
    # same id -> same split under different partitioning
    out2 = hash_split(docs.repartition(5), "doc_id",
                      {"train": 0.8, "valid": 0.1, "test": 0.1})
    m1 = {r["doc_id"]: r["split"] for r in out.select("doc_id", "split").collect()}
    m2 = {r["doc_id"]: r["split"] for r in out2.select("doc_id", "split").collect()}
    assert m1 == m2


def test_hash_split_rejects_bad_weights(spark):
    docs = spark.range(3).withColumnRenamed("id", "doc_id")
    with pytest.raises(ValueError):
        hash_split(docs, "doc_id", {"a": 0.5, "b": 0.2})


def test_winnow_arrow_kernel_guarantee_and_determinism(spark):
    from datacontract_cli_spark.operators import dedup
    shared = "zqxwvu shared substring block here"  # > k+window-1 chars
    rows = [
        (1, "prefix one " + shared + " suffix alpha"),
        (2, "different lead " + shared + " other tail"),
        (3, "completely unrelated text with nothing common at all"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = dedup.winnow_shared_pairs(df, "doc_id", k=8, window=4,
                                      min_shared=1, hash_family="arrow")
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    # winnowing guarantee: docs sharing a substring of length >= k+window-1
    # share at least one fingerprint, regardless of hash family
    assert (1, 2) in got
    assert not any(3 in p for p in got)
    # deterministic under different partitioning
    again = dedup.winnow_shared_pairs(df.repartition(5), "doc_id", k=8,
                                      window=4, min_shared=1,
                                      hash_family="arrow")
    assert {(r["id_a"], r["id_b"]) for r in again.collect()} == got


def test_simhash_arrow_kernel(spark):
    from datacontract_cli_spark.operators import dedup
    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "the quick brown fox jumps over the lazy dog again today"),  # dup
        (3, "the quick brown fox jumps over the lazy cat again today"),  # near
        (4, "entirely different words about benchmarks and shuffles"),
        (5, ""),  # empty doc must not crash or alias a neighbor's bits
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {(r["id_a"], r["id_b"]) for r in
             dedup.simhash_near_duplicates(df, "doc_id", max_hamming=3,
                                           hash_family="arrow").collect()}
    assert (1, 2) in pairs           # identical: hamming 0 in ANY family
    assert not any(4 in p for p in pairs)
    assert not any(5 in p for p in pairs)
    # signatures deterministic under partitioning
    s1 = dedup._simhash_words_arrow(df, "doc_id").orderBy("id").collect()
    s2 = dedup._simhash_words_arrow(df.repartition(4), "doc_id") \
        .orderBy("id").collect()
    assert [tuple(r) for r in s1] == [tuple(r) for r in s2]
    # identical docs have identical signatures; empty doc is all-zero
    by_id = {r["id"]: r for r in s1}
    assert by_id[1]["bits"] == by_id[2]["bits"]
    assert all(b == 0 for b in by_id[5]["bits"])
