"""BM25 full-text retrieval over a document corpus.

The retrieval counterpart of `similarity.cosine_topk`: keyword top-k with
the Okapi BM25 ranking function (Robertson & Zaragoza 2009) instead of an
embedding metric. Training-data pipelines use exactly this shape to mine
corpus documents for a query set (e.g. dataset decontamination audits,
targeted data curation, hard-negative mining for retrievers).

Spark-first shape — the query terms prune the scan before anything wide,
and the per-term statistics collapse to LITERALS so the returned plan
scans the corpus exactly once:

  job A: (N, avgdl) — one narrow agg, two scalars
  job B: df(t) per query term — ≤ |q| rows collected; idf literals
  returned plan:
    explode(words) → filter(w ∈ query)          — narrow; non-query terms
                                                  never leave the scan stage
    groupBy(doc_id, w): tf                      — the only wide shuffle,
                                                  rows ≤ matching docs × |q|
    idf via literal CASE over terms             — no join, no second branch
    groupBy(doc_id): Σ → orderBy().limit(k)     — TakeOrderedAndProject

A naive two-branch plan (tf ⋈ groupBy(w)-derived idf) re-scans the
corpus for the df aggregate — Catalyst prunes the branches differently,
so the exchange is NOT reused (measured: 2 corpus scans). Collecting the
≤|q|-row df table instead makes the main plan single-scan.

Document length (dl) is computed per row as `size(words(text))` — a
narrow projection, never a token-level shuffle.

At 100 TB: the corpus is scanned once per statistics job and once for
scoring, never shuffled — the wide stages carry only (doc_id, term)
pairs for terms that appear in the query (|q| is tens of words). For
repeated querying, materialize `doc_term_stats` partitioned by term and
partition pruning does the candidate cut.
"""

from __future__ import annotations

import math
from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _words(col: Column) -> Column:
    """Whitespace tokens of the lowercased text (shared normalization with
    the tf-idf / lm_score / dsir lanes)."""
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")


def bm25_topk(docs: DataFrame, query: Sequence[str], k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              k1: float = 1.2, b: float = 0.75,
              round_to: int = 5) -> DataFrame:
    """Top-k documents for ``query`` by BM25 score.

      score(d) = Σ_{t ∈ q} idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1 − b + b·dl/avgdl))
      idf(t)   = ln(1 + (N − df(t) + 0.5) / (df(t) + 0.5))

    Duplicate query terms are counted once (set semantics, the standard
    BM25 treatment). Returns (id, score, n_query_terms_matched) ordered by
    (score desc, id asc) — the tie-break makes the cut deterministic.
    """
    terms = sorted({t for t in (w.strip().lower() for w in query) if t})
    if not terms:
        raise ValueError("bm25_topk: empty query")

    # bind the token array once, then derive dl from the bound column —
    # avoids evaluating the split twice per row
    base = (docs.select(F.col(id_col).alias("id"),
                        _words(F.col(text_col)).alias("ws"))
            .select("id", F.size("ws").alias("dl"), "ws"))
    # job A+B merged — N, avgdl AND df(t) per term in ONE corpus scan
    # (the old shape paid a second full scan + token explode + shuffle for
    # the df aggregate; df(t) is just a count of docs whose token array
    # contains t, an array_contains count-if per term, narrow and
    # exchange-free). Collected so idf becomes literals and the scoring
    # plan needs no second corpus branch (see module docstring).
    stats = base.agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("dl").alias("avgdl"),
        *[F.count(F.when(F.array_contains("ws", t), 1)).alias(f"df_{i}")
          for i, t in enumerate(terms)],
    ).collect()[0]
    n_docs, avgdl = int(stats["n"]), float(stats["avgdl"] or 1.0)
    idf = {
        t: math.log(1.0 + (float(n_docs) - stats[f"df_{i}"] + 0.5)
                    / (stats[f"df_{i}"] + 0.5))
        for i, t in enumerate(terms) if stats[f"df_{i}"] > 0
    }
    if not idf:
        # no query term occurs anywhere: empty result, stable schema
        return (docs.select(F.col(id_col), F.lit(0.0).alias("bm25"),
                            F.lit(0).cast("long").alias("n_terms_matched"))
                .limit(0))

    # filter the token ARRAY before exploding: the generator then emits
    # only query-term hits instead of every corpus token (identical
    # multiset — filter∘explode == explode∘filter)
    q_terms = F.array(*[F.lit(t) for t in sorted(idf)])
    tf = (base.select(
              "id", "dl",
              F.explode(F.filter("ws", lambda w: F.array_contains(
                  q_terms, w))).alias("w"))
          .groupBy("id", "dl", "w")
          .agg(F.count(F.lit(1)).alias("tf")))
    idf_col = F.lit(0.0)
    for w, v in sorted(idf.items()):
        idf_col = F.when(F.col("w") == w, F.lit(v)).otherwise(idf_col)
    part = (idf_col * F.col("tf") * (1.0 + k1)
            / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / avgdl)))
    scored = (tf.groupBy("id")
              .agg(F.round(F.sum(part), round_to).alias("bm25"),
                   F.count(F.lit(1)).alias("n_terms_matched")))
    return (scored.orderBy(F.desc("bm25"), F.asc("id"))
            .limit(k)
            .select(F.col("id").alias(id_col), "bm25", "n_terms_matched"))


def doc_term_stats(docs: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """(term, doc_id, tf, dl) — the materializable inverted index for
    repeated BM25 querying. Write it partitioned/bucketed by ``term`` so a
    query's scan prunes to its own terms' files; the one wide shuffle here
    is the same (doc, term) groupBy the one-shot path pays per query."""
    return (docs.select(F.col(id_col).alias("doc_id"),
                        F.size(_words(F.col(text_col))).alias("dl"),
                        F.explode(_words(F.col(text_col))).alias("term"))
            .groupBy("term", "doc_id", "dl")
            .agg(F.count(F.lit(1)).alias("tf")))
