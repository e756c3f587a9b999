"""Product quantization (PQIndex): codes, ADC scoring, exact re-rank.

Reference parity: the reference has no ANN at all; this is the FAISS
IVF-PQ design (Jégou et al., TPAMI 2011) re-expressed Spark-first —
bounded driver training, Arrow-batched encode, heap top-k over codes."""

import numpy as np
import pytest

from datacontract_cli_spark.operators.similarity import PQIndex, cosine_topk


def _clustered(spark, n_clusters=8, per=40, dim=32, seed=3):
    """Vectors in tight clusters: ADC must keep cluster members together."""
    rng = np.random.default_rng(seed)
    centers = rng.standard_normal((n_clusters, dim)) * 4
    rows = []
    for i in range(n_clusters * per):
        c = i % n_clusters
        rows.append((i, (centers[c] + rng.standard_normal(dim) * 0.05)
                     .tolist()))
    return (spark.createDataFrame(rows,
                                  "vec_id long, embedding array<double>"),
            rows)


def test_pq_code_size_and_determinism(spark):
    df, _ = _clustered(spark)
    pq = PQIndex(m=8, nbits=4, seed=42).fit(df, "embedding")
    codes = pq.encode(df, "embedding").collect()
    assert all(len(r["code"]) == 8 for r in codes)  # m bytes per vector
    again = PQIndex(m=8, nbits=4, seed=42).fit(df, "embedding") \
        .encode(df, "embedding").collect()
    assert {r["id"]: r["code"] for r in codes} \
        == {r["id"]: r["code"] for r in again}


def test_pq_rejects_indivisible_dim(spark):
    df, _ = _clustered(spark, dim=30)
    with pytest.raises(ValueError, match="not divisible"):
        PQIndex(m=8).fit(df, "embedding")


def test_pq_rejects_oversized_codebook():
    # nbits > 8 would silently wrap codeword ids in the uint8 codes
    with pytest.raises(ValueError, match="uint8"):
        PQIndex(m=8, nbits=10)


def test_pq_adc_topk_recalls_cluster(spark):
    """ADC-only top-k over codes: the query's own cluster dominates the
    shortlist even though no float vector is read at query time."""
    df, rows = _clustered(spark)
    pq = PQIndex(m=8, nbits=4, seed=42).fit(df, "embedding")
    codes = pq.encode(df, "embedding")
    query = rows[5][1]  # a member of cluster 5 % 8
    got = pq.topk(codes, query, k=10).collect()
    same_cluster = [r["id"] for r in got if r["id"] % 8 == 5]
    assert len(same_cluster) >= 8  # >=80% of the ADC shortlist


def test_ivfpq_composition(spark):
    """IVF cell probing + ADC over the survivors' codes: the shortlist
    reads codes of probed cells only, and with re-rank the top-1 equals
    brute force."""
    from datacontract_cli_spark.operators.similarity import (
        IVFIndex,
        ivfpq_topk,
    )

    df, rows = _clustered(spark)
    ivf = IVFIndex(n_cells=8, seed=42).fit(df, "embedding")
    pq = PQIndex(m=8, nbits=4, seed=42).fit(df, "embedding")
    indexed = pq.encode(ivf.assign(df, "embedding"), "v", id_col="id",
                        keep=("cell",))
    assert set(indexed.columns) == {"id", "code", "cell"}
    query = rows[7][1]
    got = ivfpq_topk(ivf, pq, indexed, query, k=5, nprobe=2, rerank=df)
    top = got.collect()
    exact = cosine_topk(df, "embedding", query, k=1).collect()
    assert top[0]["vec_id"] == exact[0]["vec_id"] == 7


def test_pq_rerank_matches_exact_top1(spark):
    """With exact re-rank the top-1 equals brute-force cosine top-1, and
    scores are the EXACT cosine (not the quantized approximation)."""
    df, rows = _clustered(spark)
    pq = PQIndex(m=8, nbits=4, seed=42).fit(df, "embedding")
    codes = pq.encode(df, "embedding")
    query = rows[12][1]
    got = pq.topk(codes, query, k=5, rerank=df).collect()
    exact = cosine_topk(df, "embedding", query, k=1).collect()
    assert got[0]["vec_id"] == exact[0]["vec_id"] == 12
    assert got[0]["cosine_sim"] == pytest.approx(
        exact[0]["cosine_sim"], abs=1e-12)
