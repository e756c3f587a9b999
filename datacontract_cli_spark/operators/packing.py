"""Training-batch construction: sequence packing and corpus mixing.

Two operators a pretraining data pipeline runs after filtering/dedup:

- ``pack_sequences``: assign documents to fixed-token-budget bins (the
  "sequence packing" step that turns variable-length documents into
  near-full training sequences, minimizing pad waste).
- ``mixture_sample``: subsample each source to hit target mixture
  weights under a global token budget (the Pile/DoReMi-style domain
  mixing step).

Both are deterministic (md5 order / greedy contiguous rule) so any engine
reproduces the same assignment — no RNG, no collect of data rows.

Scale notes:
- Packing bins are computed per hash-bucket: the cumulative-sum window is
  PARTITIONED (never global), so 100 TB packs as B independent streams;
  bin ids are globally unique via (bucket, local_bin). First-fit-decreasing
  within a bucket ≈ the quality of global FFD while staying parallel.
- Mixing needs one tiny per-source aggregate (collected — rows = number
  of sources, single digits) and then a per-row md5-threshold filter:
  partition-invariant, zero shuffles on the big table.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _words(col: Column) -> Column:
    return F.filter(F.split(F.lower(col), r"\s+"), lambda w: w != "")


def _md5_frac(col: Column) -> Column:
    """Deterministic uniform-ish fraction in [0, 1) from md5 — the shared
    hash family, so DuckDB reproduces the sample exactly."""
    return (F.conv(F.substring(F.md5(col.cast("string")), 1, 8), 16, 10)
            .cast("double") / F.lit(float(1 << 32)))


def pack_sequences(docs: DataFrame, budget: int, id_col: str = "doc_id",
                   text_col: str = "text", n_buckets: int = 8,
                   length_col: Optional[str] = None,
                   group_cols: Sequence[str] = (),
                   keep_cols: bool = False) -> DataFrame:
    """(id, n_tokens, bucket, bin_id) — greedy contiguous packing.

    Within each (group, md5-bucket) stream, documents are ordered
    (n_tokens DESC, id ASC) — first-fit-decreasing order — and split at
    budget boundaries of the running token sum:
    ``bin = floor((cumsum − n) / budget)``. Every bin's total is ≤ budget
    + the length of the document that crosses the boundary (standard
    greedy guarantee; documents longer than the budget own their bin).

    ``group_cols`` keeps bins group-pure — packing after a train/valid
    split MUST pass the split column here, or one bin mixes documents
    across splits and a bin-streaming training reader leaks eval text.
    With groups, ``bin_id`` is a string ``grp/…/bucket/local`` (globally
    unique across groups); without, it stays the numeric
    ``bucket·2⁴⁰ + local``.

    ``length_col`` short-circuits tokenization when a token count is
    already materialized. ``keep_cols=True`` returns the FULL input frame
    plus (n_tokens, bucket, bin_id) — the window rides the same scan, so
    composed pipelines don't need a bin join-back that would re-plan the
    upstream lineage twice.
    """
    n_tok = (F.col(length_col) if length_col
             else F.size(_words(F.col(text_col))))
    bucket = (F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 6),
                     16, 10).cast("long") % n_buckets)
    if keep_cols:
        narrow = docs
    else:
        needed = [id_col] + [g for g in group_cols if g != id_col] \
            + ([length_col] if length_col else [text_col])
        narrow = docs.select(*dict.fromkeys(needed))
    base = (narrow
            .withColumn("n_tokens", n_tok.cast("long"))
            .withColumn("bucket", bucket))
    w = (Window.partitionBy(*group_cols, "bucket")
         .orderBy(F.desc("n_tokens"), F.asc(id_col))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = F.floor((F.sum("n_tokens").over(w) - F.col("n_tokens"))
                    / F.lit(budget))
    if group_cols:
        bin_id = F.concat_ws(
            "/", *[F.col(g).cast("string") for g in group_cols],
            F.col("bucket").cast("string"), local.cast("string"))
    else:
        bin_id = F.col("bucket") * F.lit(1 << 40) + local
    out = base.withColumn("bin_id", bin_id)
    if keep_cols:
        return out
    return out.select(id_col, *group_cols, "n_tokens", "bucket", "bin_id")


def packing_stats(docs: DataFrame, budget: int, id_col: str = "doc_id",
                  text_col: str = "text", n_buckets: int = 8,
                  length_col: Optional[str] = None,
                  round_to: int = 6) -> DataFrame:
    """One-row packing efficiency summary: bins used, mean fill fraction,
    and pad waste = 1 − total_tokens / (n_bins · budget)."""
    packed = pack_sequences(docs, budget, id_col, text_col, n_buckets,
                            length_col)
    bins = packed.groupBy("bin_id").agg(F.sum("n_tokens").alias("fill"))
    return bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("fill").alias("total_tokens"),
        F.round(F.avg(F.col("fill") / F.lit(float(budget))), round_to)
        .alias("avg_fill"),
        F.round(F.lit(1.0) - F.sum("fill")
                / (F.count(F.lit(1)) * F.lit(float(budget))), round_to)
        .alias("pad_waste"),
    )


def chunk_documents(docs: DataFrame, chunk_size: int,
                    stride: Optional[int] = None, id_col: str = "doc_id",
                    text_col: str = "text") -> DataFrame:
    """(id, chunk_idx, n_tokens, chunk_text) — sliding-window chunking of
    each document into ``chunk_size``-token windows every ``stride``
    tokens (default: non-overlapping, stride = chunk_size). The RAG /
    context-window preprocessing step.

    Chunk starts are 0, stride, 2·stride, … while start < n_tokens, so
    every token lands in ≥1 chunk and the final chunk may be short.
    Entirely narrow — transform over a bound token array + posexplode;
    nothing shuffles until whatever the caller aggregates."""
    if chunk_size < 1:
        raise ValueError("chunk_size must be >= 1")
    stride = chunk_size if stride is None else stride
    if stride < 1:
        raise ValueError("stride must be >= 1")
    base = docs.select(F.col(id_col).alias("id"),
                       _words(F.col(text_col)).alias("ws"))
    n = F.size("ws")
    # number of starts strictly below n; F.sequence DESCENDS when stop <
    # start, so empty docs must short-circuit to an empty array
    n_chunks = F.floor((n - 1) / F.lit(stride)) + 1
    starts = F.when(n > 0, F.sequence(F.lit(0), (n_chunks - 1).cast("int"))
                    ).otherwise(F.array().cast("array<int>"))
    chunks = F.transform(
        starts,
        lambda i: F.slice(F.col("ws"), i * stride + 1, chunk_size))
    return (base.select("id", F.posexplode(chunks).alias("chunk_idx", "c"))
            .select(F.col("id").alias(id_col), "chunk_idx",
                    F.size("c").cast("long").alias("n_tokens"),
                    F.array_join("c", " ").alias("chunk_text")))


def mixture_sample(docs: DataFrame, targets: Dict[str, float],
                   sample_frac: float, source_col: str = "source",
                   id_col: str = "doc_id",
                   length_col: Optional[str] = "n_chars") -> DataFrame:
    """Subsample so the kept corpus approaches the ``targets`` mixture
    (source → weight, weights summing to 1) at ``sample_frac`` of the
    original TOKEN volume.

    Per source s with current token share c_s, the keep probability is
    p_s = min(1, sample_frac · t_s / c_s); rows keep when
    md5_frac(id) < p_s — deterministic, partitioning-invariant, and
    independent per row, so no shuffle touches the corpus. Sources absent
    from ``targets`` are dropped. Upsampling is clamped at p=1 (this
    operator never duplicates rows; callers wanting hard upsampling union
    extra md5-band passes).
    """
    total = sum(targets.values())
    if total <= 0:
        raise ValueError("mixture targets must sum > 0")
    # length_col=None: every document weighs 1 (row-share mixing instead
    # of token-share) — for frames without a materialized length column
    weight = (F.col(length_col).cast("double") if length_col
              else F.lit(1.0))
    shares = (docs.groupBy(source_col)
              .agg(F.sum(weight).alias("tok"))
              .collect())
    all_tok = sum(r["tok"] or 0.0 for r in shares)
    p: Dict[str, float] = {}
    for r in shares:
        s = r[source_col]
        if s in targets and r["tok"]:
            c_s = r["tok"] / all_tok
            p[s] = min(1.0, sample_frac * (targets[s] / total) / c_s)
    if not p:
        return docs.filter(F.lit(False))
    # per-row threshold via a CASE chain over the (tiny) source set
    thr = F.lit(-1.0)
    for s, ps in sorted(p.items()):
        thr = F.when(F.col(source_col) == s, F.lit(ps)).otherwise(thr)
    return docs.filter(_md5_frac(F.col(id_col)) < thr)
