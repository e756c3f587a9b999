"""Unigram-LM quality scoring (fit / score / filter)."""

import math

import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.operators import lm_score


def test_fit_vocab_deterministic_cap(spark):
    corpus = spark.createDataFrame(
        [("a a a b b c",), ("c d",)], "text string")
    lm = {r["w"]: r["c"] for r in
          lm_score.fit_unigram_lm(corpus, vocab_size=3).collect()}
    # counts a=3, b=2, c=2, d=1; cap 3 keeps a then (b,c) by word asc
    assert lm == {"a": 3, "b": 2, "c": 2}
    # min_count prunes before the rank without changing the kept set
    lm2 = {r["w"]: r["c"] for r in
           lm_score.fit_unigram_lm(corpus, vocab_size=3, min_count=2).collect()}
    assert lm2 == lm


def test_score_hand_computed(spark):
    corpus = spark.createDataFrame([("a a a b",)], "text string")
    lm = lm_score.fit_unigram_lm(corpus)      # {a:3, b:1}; N=4, V=2
    docs = spark.createDataFrame(
        [(1, "a b"), (2, "zz zz")], "doc_id long, text string")
    rows = {r["doc_id"]: r for r in
            lm_score.score_documents(docs, lm).collect()}
    # p(a)=(3+1)/7, p(b)=(1+1)/7, p(oov)=1/7
    anlp1 = -(math.log(4 / 7) + math.log(2 / 7)) / 2
    assert rows[1]["avg_neg_logprob"] == pytest.approx(anlp1, abs=1e-12)
    assert rows[1]["perplexity"] == pytest.approx(math.exp(anlp1), abs=1e-9)
    assert rows[2]["avg_neg_logprob"] == pytest.approx(math.log(7), abs=1e-12)
    assert rows[1]["perplexity"] < rows[2]["perplexity"]  # in-vocab wins
    assert rows[1]["n_tokens"] == 2


def test_quality_filter_keeps_reference_like(spark):
    corpus = spark.createDataFrame(
        [("the quick brown fox " * 5,)], "text string")
    lm = lm_score.fit_unigram_lm(corpus)
    docs = spark.createDataFrame([
        (1, "the quick brown fox"),
        (2, "xz qv jk wm pq rr"),
    ], "doc_id long, text string")
    scores = {r["doc_id"]: r["perplexity"] for r in
              lm_score.score_documents(docs, lm).collect()}
    cut = (scores[1] + scores[2]) / 2
    kept = lm_score.quality_filter(docs, lm, max_perplexity=cut).collect()
    assert [r["doc_id"] for r in kept] == [1]


def test_fit_plan_no_single_partition_window(spark):
    # (count DESC, word ASC) is a total order over the distinct vocabulary,
    # so the cut is a distributed top-k (TakeOrderedAndProject: per-partition
    # heaps), never a single-partition WindowExec sort.
    corpus = spark.createDataFrame([("a b c",)], "text string")
    plan = lm_score.fit_unigram_lm(corpus, vocab_size=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_score_plan_broadcasts_model(spark):
    corpus = spark.createDataFrame([("a b c",)], "text string")
    docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    lm = lm_score.fit_unigram_lm(corpus)
    plan = lm_score.score_documents(docs, lm) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # the vocabulary never shuffles docs


# --- tf-idf ------------------------------------------------------------------

def test_tfidf_top_terms_hand_computed(spark):
    from datacontract_cli_spark.operators.textstats import tfidf_top_terms
    docs = spark.createDataFrame([
        (1, "apple apple banana"),
        (2, "banana cherry"),
        (3, "cherry cherry cherry durian"),
    ], "doc_id long, text string")
    rows = tfidf_top_terms(docs, k=2).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple (tf=2, df=1) beats banana (tf=1, df=2)
    assert [r["term"] for r in sorted(by_doc[1], key=lambda r: r["rank"])] == \
        ["apple", "banana"]
    # doc 2: tie on tf*idf? banana df=2, cherry df=2, both tf=1 -> tie
    # broken alphabetically
    assert [r["term"] for r in sorted(by_doc[2], key=lambda r: r["rank"])] == \
        ["banana", "cherry"]
    # doc 3: cherry tf=3 dominates; durian df=1 ranks over nothing else
    d3 = sorted(by_doc[3], key=lambda r: r["rank"])
    assert d3[0]["term"] == "cherry" and d3[1]["term"] == "durian"
    # idf check: N=3, df(apple)=1 -> idf = ln(4/2)+1
    import math
    apple = [r for r in by_doc[1] if r["term"] == "apple"][0]
    assert apple["tfidf"] == pytest.approx(
        round(2 * (math.log(4 / 2) + 1), 6), abs=1e-9)


def test_tfidf_min_df_prunes_rare_terms(spark):
    from datacontract_cli_spark.operators.textstats import tfidf_top_terms
    docs = spark.createDataFrame([
        (1, "common rare1"), (2, "common rare2")],
        "doc_id long, text string")
    rows = tfidf_top_terms(docs, k=5, min_df=2).collect()
    assert {r["term"] for r in rows} == {"common"}
