"""PII detect/scrub operators and the benchmark-contamination check."""

import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.operators import pii
from datacontract_cli_spark.operators.contamination import (
    contaminated_docs,
    contamination_stats,
    word_ngrams,
)


def _texts(spark):
    return spark.createDataFrame([
        (1, "mail me at bob.smith+x@corp.example.org today"),
        (2, "call 25-989-741-2988 or 123-456-7890"),
        (3, "server at 10.0.255.1 and card 1234-5678-9012-3456"),
        (4, "ssn 123-45-6789 hidden here"),
        (5, "nothing sensitive at all"),
        (6, None),
    ], "id long, text string")


def test_match_counts_per_category(spark):
    df = _texts(spark)
    rows = {r["id"]: r for r in df.select(
        "id",
        pii.match_count(F.col("text"), "email").alias("email"),
        pii.match_count(F.col("text"), "phone").alias("phone"),
        pii.match_count(F.col("text"), "ipv4").alias("ipv4"),
        pii.match_count(F.col("text"), "ssn").alias("ssn"),
        pii.match_count(F.col("text"), "credit_card").alias("cc"),
    ).collect()}
    assert rows[1]["email"] == 1 and rows[1]["phone"] == 0
    assert rows[2]["phone"] == 2
    assert rows[3]["ipv4"] == 1 and rows[3]["cc"] == 1
    assert rows[4]["ssn"] == 1
    assert rows[5]["email"] + rows[5]["phone"] + rows[5]["ipv4"] == 0
    assert rows[6]["email"] == 0  # null-safe


def test_contains_and_scrub(spark):
    df = _texts(spark).filter(F.col("text").isNotNull())
    flagged = df.filter(pii.contains_pii(F.col("text"))).count()
    assert flagged == 4  # all but "nothing sensitive"
    scrubbed = df.select(
        pii.scrub(F.col("text")).alias("s")).collect()
    for r in scrubbed:
        # residual scan over scrubbed text finds nothing
        assert "@" not in r["s"] or "[PII]" in r["s"]
    residual = df.select(pii.scrub(F.col("text")).alias("s")) \
        .filter(pii.contains_pii(F.col("s"))).count()
    assert residual == 0


def test_scrub_order_credit_card_before_phone(spark):
    # a credit card must mask as ONE token, not leave phone-shaped halves
    df = spark.createDataFrame([("pay 1234-5678-9012-3456 now",)], "t string")
    out = df.select(pii.scrub(F.col("t")).alias("s")).collect()[0]["s"]
    assert out == "pay [PII] now"


def test_pii_summary_shape(spark):
    df = _texts(spark)
    rows = pii.pii_summary(df, ["text"], ["email", "phone"]).collect()
    by_cat = {r["category"]: r for r in rows}
    assert set(by_cat) == {"email", "phone"}
    assert by_cat["email"]["values_with_match"] == 1
    assert by_cat["phone"]["values_with_match"] == 1
    assert by_cat["phone"]["match_count"] == 2


# --- contamination -----------------------------------------------------------

def test_word_ngrams(spark):
    df = spark.createDataFrame([("a b c d",), ("a b",), ("",)], "t string")
    rows = df.select(word_ngrams(F.col("t"), 3).alias("g")).collect()
    assert rows[0]["g"] == ["a b c", "b c d"]
    assert rows[1]["g"] == []  # shorter than n: empty, NOT sequence(1,0)
    assert rows[2]["g"] == []


def test_contaminated_docs_exact(spark):
    corpus = spark.createDataFrame([
        (10, "the quick brown fox jumps over the lazy dog"),
        (11, "completely unrelated words in this one here"),
        (12, "ends with quick brown fox jumps over something"),
    ], "doc_id long, text string")
    bench = spark.createDataFrame(
        [(1, "QUICK Brown Fox Jumps Over everything")],
        "doc_id long, text string")
    flagged = {r["doc_id"] for r in
               contaminated_docs(corpus, bench, n=5).collect()}
    assert flagged == {10, 12}  # case-insensitive 5-gram overlap
    stats = contamination_stats(corpus, bench, n=5).collect()[0]
    assert stats["contaminated_docs"] == 2
    assert stats["total_docs"] == 3
    assert stats["contamination_rate"] == pytest.approx(2 / 3, abs=1e-6)


def test_contamination_hashed_kernel_matches_raw(spark):
    corpus = spark.createDataFrame(
        [(i, f"shared prefix tokens one two three plus {i}") for i in range(20)]
        + [(99, "totally different text with no overlap at all")],
        "doc_id long, text string")
    bench = spark.createDataFrame(
        [(0, "shared prefix tokens one two three")], "doc_id long, text string")
    raw = {r["doc_id"] for r in contaminated_docs(corpus, bench, n=6).collect()}
    hashed = {r["doc_id"] for r in
              contaminated_docs(corpus, bench, n=6, hash_grams=True).collect()}
    assert raw == hashed and 99 not in raw and len(raw) == 20


def test_contamination_plan_broadcasts_benchmark(spark):
    corpus = spark.createDataFrame([(1, "a b c d e f")], "doc_id long, text string")
    bench = spark.createDataFrame([(2, "a b c d e")], "doc_id long, text string")
    plan = contaminated_docs(corpus, bench, n=5, hash_grams=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
